from ont_d2rq_spark.mapping.model import (
    Mapping,
    Database,
    ClassMap,
    PropertyBridge,
    TranslationTable,
    Join,
    Configuration,
    DownloadMap,
)
from ont_d2rq_spark.mapping.parser import load_mapping, load_mapping_dict

__all__ = [
    "Mapping",
    "Database",
    "ClassMap",
    "PropertyBridge",
    "TranslationTable",
    "Join",
    "Configuration",
    "DownloadMap",
    "load_mapping",
    "load_mapping_dict",
]
