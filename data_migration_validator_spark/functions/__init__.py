from .digest import (  # noqa: F401
    content_sha256,
    null_safe_string,
    row_digest,
    row_digest_pandas,
)
