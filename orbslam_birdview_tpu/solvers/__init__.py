from . import epnp, icp, initializer, pnp, ransac, sim3, twoview  # noqa: F401
