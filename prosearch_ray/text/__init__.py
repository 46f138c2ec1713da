from prosearch_ray.text.tokenizer import (  # noqa: F401
    camel_digit_split,
    simple_tokenize,
    tokenize,
    tokenize_query,
)
