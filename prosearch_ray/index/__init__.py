from prosearch_ray.index.fieldnorm import (  # noqa: F401
    FIELD_NORMS_TABLE,
    fieldnorm_to_id,
    id_to_fieldnorm,
)
