from nagios_custom_etl_spark.functions.scalar import (  # noqa: F401
    dec,
    dsum,
    davg,
    numeric_normalize,
    epoch_to_datetime_str,
    datetime_str_to_epoch,
    ts_str,
    categorical_decode,
    categorical_encode,
    map_get_default,
    canonical_row_hash,
)
