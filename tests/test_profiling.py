from acav100m_tpu.utils.profiling import (
    IterTimer,
    Meters,
    ScalarMeter,
    TensorBoardWriter,
    device_trace,
)


class TestProfiling:
    def test_scalar_meter(self):
        m = ScalarMeter(window_size=3)
        for v in (1, 2, 3, 4):
            m.add_value(v)
        assert m.get_win_avg() == 3.0
        assert m.get_win_median() == 3.0
        assert m.get_global_avg() == 2.5

    def test_iter_timer(self):
        t = IterTimer()
        assert t.tick() >= 0
        assert t.mean >= 0

    def test_meters_bag(self):
        m = Meters()
        m.add(loss=1.0, acc=50.0)
        m.add(loss=0.5, acc=60.0)
        snap = m.snapshot()
        assert snap["loss"] == 0.75 and snap["acc"] == 55.0

    def test_tb_writer(self, tmp_path):
        w = TensorBoardWriter(tmp_path / "tb")
        w.add_scalars({"loss": 1.0}, step=1)
        w.close()
        # disabled writer is a no-op
        TensorBoardWriter(None).add_scalars({"x": 1.0}, 0)

    def test_device_trace_noop(self):
        with device_trace(None):
            pass


def test_get_open_fds_counts():
    from acav100m_tpu.utils.profiling import get_open_fds

    before = get_open_fds()
    assert before > 0
    with open("/dev/null") as f:  # noqa: F841
        assert get_open_fds() == before + 1
