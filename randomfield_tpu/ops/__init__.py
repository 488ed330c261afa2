"""Core spectral ops: k-space geometry, transforms, power tools, sampling."""
