"""shard_map compatibility across jax versions.

jax >= 0.8 exposes jax.shard_map (kw `check_vma`); older versions have
jax.experimental.shard_map.shard_map (kw `check_rep`). We always disable the
replication checker: the sharded DBA/raster bodies prove replication by
construction (psum/all_gather outputs) and the checker rejects some valid
mixed patterns.
"""

from __future__ import annotations


def shard_map(f, mesh, in_specs, out_specs):
    try:
        from jax import shard_map as sm

        try:
            return sm(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                      check_vma=False)
        except TypeError:
            return sm(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs)
    except ImportError:
        from jax.experimental.shard_map import shard_map as sm

        return sm(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                  check_rep=False)
