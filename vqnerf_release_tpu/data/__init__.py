"""Data layer: camera/ray generation, image IO, and dataset loaders that
read the reference's on-disk formats (surf buffers, transforms json, DTU
projection matrices, test envmaps)."""
