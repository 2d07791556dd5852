from cminer_spark.sources.data_format import (
    read_data_db,
    write_mappings_text,
    write_patterns_text,
    parse_pattern_text,
)
from cminer_spark.sources.graph_loaders import read_csv_graph_db, read_json_graph
from cminer_spark.sources.validate import VALID_ROLES, validate_transcripts
from cminer_spark.sources.bucketed import read_bucketed_edges, write_bucketed_edges

__all__ = [
    "read_data_db",
    "write_mappings_text",
    "write_patterns_text",
    "parse_pattern_text",
    "read_csv_graph_db",
    "read_json_graph",
    "VALID_ROLES",
    "validate_transcripts",
    "read_bucketed_edges",
    "write_bucketed_edges",
]
