"""animals3d_tpu — TPU-native framework for articulated 3D animal reconstruction.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of the 3DAnimals stack
(MagicPony / 3D-Fauna / Ponymation): unsupervised single-image articulated 3D
reconstruction and motion generation, built around

  * a hybrid SDF + tetrahedral-grid shape representation (static-shape marching
    tetrahedra, see `animals3d_tpu.ops.dmtet`),
  * a differentiable tile rasterizer that evaluates edge/depth functions as
    matmuls on the MXU (`animals3d_tpu.ops.rasterize`),
  * coordinate-MLP fields for SDF / texture / DINO features / deformation,
  * heuristic skeleton estimation + linear blend skinning,
  * data-parallel training over a `jax.sharding.Mesh`.

Reference behavior documented in SURVEY.md (reference repo: 3DAnimals/3DAnimals).
"""

__version__ = "0.1.0"
