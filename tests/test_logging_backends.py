import numpy as np

import synthetic
from splatloam_tpu.logging_backends import (DataLoggerDummy, get_datalogger,
                                            reset_datalogger)


def test_dummy_logger_by_default(tmp_path):
    reset_datalogger()
    cfg = synthetic.make_config(tmp_path)  # logging.enable = False
    assert isinstance(get_datalogger(cfg), DataLoggerDummy)
    reset_datalogger()


def test_tensorboard_backend_logs(tmp_path):
    reset_datalogger()
    cfg = synthetic.make_config(
        tmp_path,
        logging={"enable": True, "logger_type": "tensorboard"},
        output={"folder": str(tmp_path / "out"), "writer": "tum"})
    dlog = get_datalogger(cfg)
    from splatloam_tpu.logging_backends.tensorboard_logging import \
        DataLoggerTB
    assert isinstance(dlog, DataLoggerTB)
    dlog.set_timestamp(1.5)
    dlog.log_depth_image("frame/depth", np.random.rand(8, 16))
    dlog.log_image("frame/normals", np.random.rand(8, 16, 3))
    dlog.log_transform("world/model", np.eye(4))
    dlog.log_scalar("loss", 0.5)
    dlog.log_pointcloud("cloud", np.zeros((10, 3)))
    from splatloam_tpu.model.surfels import empty_surfels
    dlog.log_model("world/model", empty_surfels(16))
    dlog.writer.flush()
    events = list((tmp_path / "out" / "tensorboard").glob("events.*"))
    assert events, "no tensorboard event files written"
    reset_datalogger()
