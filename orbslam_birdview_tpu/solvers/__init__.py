from . import icp, initializer, pnp, ransac, sim3, twoview  # noqa: F401
