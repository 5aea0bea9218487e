"""SPMD parallelism: device meshes, sharding rules, distributed train/eval steps."""
