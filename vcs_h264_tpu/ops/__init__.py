"""Device-side compute ops (color, subsampling, transform, intra, motion)."""
