from osmquadtree_rust_bindings_spark.sources import catalog, images  # noqa: F401
