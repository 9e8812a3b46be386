"""Multi-chip scaling: device meshes, sharded design sweeps, distributed PCG."""
