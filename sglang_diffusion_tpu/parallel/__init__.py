from sglang_diffusion_tpu.parallel.mesh import (
    MeshContext,
    create_mesh,
    get_mesh_context,
    set_mesh_context,
)

__all__ = ["MeshContext", "create_mesh", "get_mesh_context", "set_mesh_context"]
