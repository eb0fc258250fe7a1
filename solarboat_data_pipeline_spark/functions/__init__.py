from solarboat_data_pipeline_spark.functions.geo import (  # noqa: F401
    derive_track,
    haversine_km,
    heading_deg,
)
from solarboat_data_pipeline_spark.functions.formatting import (  # noqa: F401
    candump_line,
    payload_from_int_array,
)
