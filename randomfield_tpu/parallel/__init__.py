"""Multi-chip execution: device meshes, distributed FFT, sharded rendering."""
