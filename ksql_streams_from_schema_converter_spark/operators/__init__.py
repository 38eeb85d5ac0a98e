from .compiler import (  # noqa: F401
    BlobResolver,
    CompiledField,
    CompileError,
    ExplodedResolver,
    FieldSpec,
    MappedResolver,
    compile_field,
    compile_projection,
)
