from solarboat_data_pipeline_spark.sources.candump import (  # noqa: F401
    FRAME_REGEX,
    extract_frames,
    scan_candump,
)
