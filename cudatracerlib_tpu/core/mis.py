"""Multiple importance sampling heuristics (reference: ``Math/MonteCarlo.h:24-33``)."""
from __future__ import annotations

import jax.numpy as jnp


def balance_heuristic(pdf_a, pdf_b):
    return pdf_a / jnp.maximum(pdf_a + pdf_b, 1e-20)


def power_heuristic(pdf_a, pdf_b):
    a2 = pdf_a * pdf_a
    b2 = pdf_b * pdf_b
    return a2 / jnp.maximum(a2 + b2, 1e-20)


def pdf_area_to_solid_angle(pdf_area, dist_sqr, cos_there):
    """Convert a pdf w.r.t. area at the target to solid angle at the source."""
    return pdf_area * dist_sqr / jnp.maximum(jnp.abs(cos_there), 1e-12)


def pdf_solid_angle_to_area(pdf_sa, dist_sqr, cos_there):
    return pdf_sa * jnp.abs(cos_there) / jnp.maximum(dist_sqr, 1e-20)
