"""Sampling records (reference: ``SceneTypes/Samples.h:94-182``).

Functional JAX counterparts of Mitsuba's sampling-record structs. These are
NamedTuple pytrees of batched arrays; `measure` uses the constants below.
"""
from __future__ import annotations

from typing import NamedTuple

import jax

Array = jax.Array

# Measures (EMeasure)
M_SOLID_ANGLE = 0
M_AREA = 1
M_DISCRETE = 2

# BSDF type flags (subset of Mitsuba's EBSDFType, used for strategy masking)
T_DIFFUSE_REFLECTION = 1 << 0
T_DIFFUSE_TRANSMISSION = 1 << 1
T_GLOSSY_REFLECTION = 1 << 2
T_GLOSSY_TRANSMISSION = 1 << 3
T_DELTA_REFLECTION = 1 << 4
T_DELTA_TRANSMISSION = 1 << 5
T_NULL = 1 << 6
T_SMOOTH = T_DIFFUSE_REFLECTION | T_DIFFUSE_TRANSMISSION | T_GLOSSY_REFLECTION | T_GLOSSY_TRANSMISSION
T_DELTA = T_DELTA_REFLECTION | T_DELTA_TRANSMISSION
T_ALL = T_SMOOTH | T_DELTA


class PositionSample(NamedTuple):
    p: Array       # (..., 3) sampled position
    n: Array       # (..., 3) surface normal at p (zeros if none)
    uv: Array      # (..., 2)
    pdf: Array     # (...,) pdf w.r.t. `measure`
    measure: Array  # (...,) int32


class DirectionSample(NamedTuple):
    d: Array
    pdf: Array
    measure: Array


class DirectSample(NamedTuple):
    """Sampling a point on an emitter/sensor as seen from a reference point."""
    p: Array        # (..., 3) point on the emitter
    n: Array        # (..., 3) normal at p
    d: Array        # (..., 3) unit direction ref -> p
    dist: Array     # (...,)
    pdf: Array      # (...,) pdf w.r.t. solid angle at the reference point
    measure: Array  # int32
    uv: Array       # (..., 2) position on the sensor film (for sensor sampling)


class BSDFSample(NamedTuple):
    wo: Array           # (..., 3) sampled direction, local frame
    weight: Array       # (..., 3) f * cos / pdf
    pdf: Array          # (...,)
    sampled_type: Array  # (...,) int32 bitmask
    eta: Array          # (...,) relative IOR change along the sampled direction


class PhaseSample(NamedTuple):
    wo: Array      # (..., 3) world frame
    weight: Array  # (...,) phase value / pdf (==1 for exact sampling)
    pdf: Array
