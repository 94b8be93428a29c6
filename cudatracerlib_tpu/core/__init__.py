from . import (aabb, compression, frame, fresnel, kernels, microfacet, mis,
               records, rng, spectrum, vecmath, warp)

__all__ = ["aabb", "compression", "frame", "fresnel", "kernels", "microfacet",
           "mis", "records", "rng", "spectrum", "vecmath", "warp"]
