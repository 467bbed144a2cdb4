from kinectdepthmapenhancement_tpu.core import buffer2d, camera, config, io, testdata

__all__ = ["buffer2d", "camera", "config", "io", "testdata"]
