from node_gedcom_graph_spark.publish.neo4j_csv import (  # noqa: F401
    atomic_publish,
    build_import_args,
    export_neo4j_csvs,
)
