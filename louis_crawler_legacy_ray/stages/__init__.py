def pool_size(frac: float = 0.5, lo: int = 1, hi: int = 16) -> tuple[int, int]:
    """Actor-pool bounds sized to the cluster (autoscaling pool up to
    ~frac of CPUs) — a fixed (1, 4) cap starves a 32-core node.

    Never auto-initializes Ray (the driver owns the session): before
    ray.init it returns a conservative default."""
    import ray

    if not ray.is_initialized():
        return (lo, max(lo, min(hi, 8)))
    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:  # noqa: BLE001
        cpus = 8
    return (lo, max(lo, min(hi, int(cpus * frac))))
