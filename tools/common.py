"""Shared helpers for the doc generators (gen_plans / gen_scaling): plan
callables that are measured/printed but intentionally NOT in the query
registry — one definition so the two documents can never describe two
different configurations as the same path."""


def knn_graph_ivf(spark, sf_dir):
    """The ANN production route for the clustering/mining operators: the
    IVF-candidate kNN graph (knn_graph strategy='ivf', n_cells='auto' ~
    sqrt(n), nprobe=2, seed=7) — measured next to its exact quadratic
    gate (knn_graph_embeddings) so the docs show the sub-quadratic
    growth the route exists for."""
    from migdar_data_pipelines_spark.llm.similarity import knn_graph

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    return knn_graph(
        e, "vec_id", "embedding", k=3, strategy="ivf",
        n_cells="auto", nprobe=2, seed=7,
    )
