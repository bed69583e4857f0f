from .incremental import (  # noqa: F401
    incremental_tle_stream,
    run_incremental_ingest,
    run_incremental_weather,
)
from .joins import (  # noqa: F401
    enriched_telemetry_stream,
    run_enrichment_join,
)
from .stateful import decay_tracker  # noqa: F401
from .windowed import (  # noqa: F401
    daily_flux_aggregate_stream,
    observation_sessions_stream,
    run_daily_flux_aggregate,
    run_observation_sessions,
)
