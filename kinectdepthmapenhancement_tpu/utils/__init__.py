from kinectdepthmapenhancement_tpu.utils import metrics, timing

__all__ = ["metrics", "timing"]
