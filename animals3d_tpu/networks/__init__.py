from animals3d_tpu.networks.mlp import (
    MLP, CoordMLP, CoordMLPMod, harmonic_embedding,
)
