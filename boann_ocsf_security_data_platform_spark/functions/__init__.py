from .hash_fns import (  # noqa: F401
    DUCKDB_HASH64_SQL,
    hash64,
    normalize_name,
    normalize_text,
    sha256_hex,
)
