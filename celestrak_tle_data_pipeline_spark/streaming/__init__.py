from .incremental import (  # noqa: F401
    incremental_tle_stream,
    run_incremental_ingest,
)
