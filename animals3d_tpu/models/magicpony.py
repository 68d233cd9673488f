"""MagicPony: category-specific single-image articulated 3D reconstruction.

Reference: `/root/reference/model/models/MagicPony.py:13-18` — the base
AnimalModel wiring BasePredictor + InstancePredictor with no extras.
"""
from animals3d_tpu.models.animal import AnimalModel


class MagicPony(AnimalModel):
    pass
