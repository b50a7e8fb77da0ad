from node_gedcom_graph_spark.graph.queries import (  # noqa: F401
    ancestors,
    children_of,
    connected_components,
    parents_of,
    siblings,
    spouses,
)
from node_gedcom_graph_spark.graph import gedcom_graph_queries  # noqa: F401
