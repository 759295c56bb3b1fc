from .safetensors_io import (  # noqa: F401
    DtypePolicy,
    LoadReport,
    inspect_safetensors,
    load_flat,
    save_flat,
)
