from tinygp_tpu.utils.module import (
    Module as Module,
    field as field,
    static_field as static_field,
)
