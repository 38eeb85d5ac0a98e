from .t24 import (  # noqa: F401
    MULTIVALUE_SEP,
    ORDINAL_PREFIX,
    blob_hex_to_text,
    inputter_his,
    mv_array,
    mv_element,
    mv_join,
    seab_field,
)
from .registry import FUNCTION_REGISTRY, translate_function  # noqa: F401
