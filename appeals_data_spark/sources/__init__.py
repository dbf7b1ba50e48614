"""External source ingest jobs (SURVEY.md §2.1).

The reference exchanges flat files with external systems by hand (the
BGS claims CSV round-trip, S6); here each exchange is a batch ingest
job that lands a normalized parquet table the analytic queries consume.
"""

from .claims_ingest import (  # noqa: F401
    CLAIMS_COLUMNS,
    claims_schema,
    ingest_claims_csv,
    normalize_claims,
)
