"""Fauna instance predictor.

Reference: `InstancePredictorFauna`
(`/root/reference/model/predictors/InstancePredictorFauna.py:29-253`).
Differences from the base predictor, mapped to this build:

  * texture `in_layer_relu=True` and articulation id-add (`:33-34`) — plain
    config fields here, set by the Fauna model;
  * pose-sampling temperature clipped at 10 instead of 100 (`:46`) — the
    `temp_clip_high` config field;
  * bones re-estimated every iteration with y-quantile leg filtering
    (`:90-93`) — our bone estimation is always in-graph per step, so only
    `bone_y_threshold` matters (config field);
  * `lookat_zeroy` disabled after `nozeroy_start` (`:250-251`) — the static
    `phase.zeroy` switch;
  * constraint schedule: `constrain_legs` is ON until
    `iter_leg_rotation_start`, then replaced by the fauna leg regularizer
    (`:149-185`, `:190-210`) — static `phase.constrain_legs` /
    `phase.leg_rot_started`.
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from animals3d_tpu.phase import Phase
from animals3d_tpu.predictors.instance import InstancePredictor


@dataclasses.dataclass(frozen=True)
class FaunaAdditionalConfig:
    """`FaunaInstanceAdditionalConfig` (`InstancePredictorFauna.py:15-22`)."""
    iter_leg_rotation_start: int = 300000
    forbid_leg_rotate: bool = True
    small_leg_angle: bool = True
    reg_body_rotate_mult: float = 0.1
    bone_y_threshold: float = 0.4
    nozeroy_start: int = 20000


class FaunaInstancePredictor(InstancePredictor):
    cfg_additional: FaunaAdditionalConfig = FaunaAdditionalConfig()

    def apply_articulation_constraints(self, angles, phase: Phase):
        """Fauna ordering (`InstancePredictorFauna.py:190-240` then
        `:149-185`): multiplier → tanh → static-root/leg clamps →
        post-leg-rotation-release regularizer → radians + body-z clamp."""
        a = self.cfg.cfg_articulation
        add = self.cfg_additional
        angles = angles * a.output_multiplier
        angles = jnp.tanh(angles)

        if a.static_root_bones:
            roots = [a.num_body_bones // 2 - 1, a.num_body_bones - 1]
            angles = angles * jnp.ones_like(angles).at[:, :, roots].set(0.0)

        nb = a.num_body_bones
        legs = nb + np.arange(a.num_leg_bones * a.num_legs)
        if phase.constrain_legs:       # until iter_leg_rotation_start
            scale = jnp.ones_like(angles)
            scale = scale.at[:, :, legs, 2].set(0.3)
            scale = scale.at[:, :, legs, 1].set(0.3)
            angles = angles * scale

        if phase.leg_rot_started and add.forbid_leg_rotate:
            scale = jnp.ones_like(angles)
            if add.small_leg_angle:
                top = [8, 11, 14, 17]
                scale = scale.at[:, :, top, 1].set(0.05)
                scale = scale.at[:, :, top, 2].set(0.05)
            bottom = [9, 10, 12, 13, 15, 16, 18, 19]
            scale = scale.at[:, :, bottom, 1].set(0.0)
            scale = scale.at[:, :, bottom, 2].set(0.0)
            angles = angles * scale

        angles = angles * (a.max_arti_angle / 180.0 * np.pi)

        # body-bone twist (z) clamp in radian space (`:176-185`)
        mult = add.reg_body_rotate_mult * 180.0 / (a.max_arti_angle * np.pi)
        body = list(range(nb))
        scale = jnp.ones_like(angles).at[:, :, body, 2].set(mult)
        return angles * scale
