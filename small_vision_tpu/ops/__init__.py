"""Device math: diffusion core, Pallas kernels, device-side preprocessing."""
