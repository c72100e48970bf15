from .dlpack import (  # noqa: F401
    surface_to_jax,
    surface_planes_to_jax,
    jax_to_surface,
    surface_to_torch,
    torch_to_surface,
    jax_to_torch,
    torch_to_jax,
)
