"""TPU-native collaborative zk-SNARK + MPC framework (zk-mpc capabilities, JAX/XLA/Pallas)."""

__version__ = "0.1.0"
