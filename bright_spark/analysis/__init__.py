from bright_spark.analysis.tokenizer import (  # noqa: F401
    count_terms,
    tokenize,
    tokenize_with_positions,
)
