from osmquadtree_rust_bindings_spark.functions import quadtree, sqlgen  # noqa: F401
