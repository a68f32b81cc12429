from .ivm import IncrementalAggView  # noqa: F401
from .schema import TableSchema, can_widen  # noqa: F401
from .table import ConcurrentCommitError, LakeTable  # noqa: F401
