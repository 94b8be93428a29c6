"""cudatracerlib_tpu — a TPU-native physically-based rendering framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
hhergeth/CudaTracerLib: Mitsuba-XML scene loading, SBVH acceleration, the full
Mitsuba material/light/sensor/medium taxonomy, and the path-tracing /
bidirectional / photon-mapping integrator family — designed wavefront-first for
TPUs (SoA queues, masked lanes, sort-based compaction, counter-based sampling,
scatter-add photon grids, image-tile sharding over a device mesh).
"""

__version__ = "0.1.0"
