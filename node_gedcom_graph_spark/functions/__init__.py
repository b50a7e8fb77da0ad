from node_gedcom_graph_spark.functions.dictionaries import (  # noqa: F401
    BOOLEAN_TAGS,
    GEDCOM_TAGS,
    TEMPLE_CODES,
    tags_df,
    temples_df,
)
from node_gedcom_graph_spark.functions.scalar import (  # noqa: F401
    boolean_encode,
    given_name,
    normalize_text,
    place_decode,
    surname,
    temple_decode,
    tokens,
)
