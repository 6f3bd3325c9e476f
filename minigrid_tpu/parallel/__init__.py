"""Multi-chip / multi-host scaling: device meshes, sharded env batches,
distributed rollout + training."""
