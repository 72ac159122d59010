from .ba import sharded_ba_step, make_mesh  # noqa: F401


def mesh_from_config(config: dict):
    """Build the backend BA mesh from ``config['tpu']['mesh_devices']``.

    Values: "auto" (default — use every attached device when more than
    one exists), an int N (use the first N devices; error if fewer are
    attached), or 0/1/"off" (single-device, no mesh). Returns a
    jax.sharding.Mesh or None. This is the one knob that makes the
    sharded-BA scale-out (parallel/ba.py) reachable from every CLI
    driver — on a single-chip host it resolves to None and the drivers
    run exactly as before.
    """
    import jax

    md = config.get("tpu", {}).get("mesh_devices", "auto")
    n_avail = len(jax.devices())
    if md in ("off", 0, 1, "0", "1", None, False):
        return None
    if md == "auto":
        n = n_avail
    else:
        n = int(md)
        if n > n_avail:
            raise ValueError(
                f"tpu.mesh_devices={n} but only {n_avail} devices attached")
    if n <= 1:
        return None
    return make_mesh(n)
