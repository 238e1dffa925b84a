from nail_parquet_spark.codec.kernels import (  # noqa: F401
    EncodedBlock,
    VALID_CODECS,
    decode_array,
    encode_array,
    kind_of,
)
from nail_parquet_spark.codec.compact import compact_blocks  # noqa: F401
