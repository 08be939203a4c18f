from pigs_tpu.utils.sampling import grid_samples, image_samples, region_kernel

__all__ = ["grid_samples", "image_samples", "region_kernel"]
