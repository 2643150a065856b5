from gaussiansplatting_tpu.models.gaussian_model import GaussianModel

__all__ = ["GaussianModel"]
