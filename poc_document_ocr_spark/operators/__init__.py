"""DataFrame operators: extraction UDF stage, window folds, dedup, similarity."""
