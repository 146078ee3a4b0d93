from preprocessor_spark.sources.io import (  # noqa: F401
    detect_format,
    load_data,
    load_timeseries_csv,
    sniff_csv_separator,
    write_data,
    write_split_datasets,
)
from preprocessor_spark.sources.iceberg import (  # noqa: F401
    TableIO,
    configure_catalog,
    iceberg_available,
)
from preprocessor_spark.sources.remote import (  # noqa: F401
    compose_config,
    remote_load_config,
    remote_log,
    remote_save_config,
)
