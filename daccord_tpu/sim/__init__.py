from daccord_tpu.sim.simulator import SimConfig, SimDataset, simulate  # noqa: F401
