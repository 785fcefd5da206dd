from c4_5decisiontreebasedonmapreduce_spark.sources.parquet import (
    TABLES,
    load_all,
    load_table,
    register_views,
)
from c4_5decisiontreebasedonmapreduce_spark.sources.tsv import (
    AttributeSpec,
    TrainingSchema,
    parse_attributes_file,
    read_training_tsv,
)

__all__ = [
    "TABLES",
    "load_table",
    "load_all",
    "register_views",
    "AttributeSpec",
    "TrainingSchema",
    "parse_attributes_file",
    "read_training_tsv",
]
