"""Dataset synthesis tool tests (txt->h5 pipeline, presets, inspection)."""

import os

import h5py
import numpy as np
import pytest

from bmcnet_esr_tpu.data import synthesis
from bmcnet_esr_tpu.data.h5dataset import DatasetConfig, EventH5Dataset
from bmcnet_esr_tpu.data.h5dataset import SequenceConfig


def write_sim_txt(path, n, h, w, seed, t_span=1.0):
    rng = np.random.default_rng(seed)
    t = np.sort(rng.random(n)) * t_span
    x = rng.integers(0, w, n)
    y = rng.integers(0, h, n)
    p = rng.integers(0, 2, n)  # simulator convention {0, 1}
    with open(path, "w") as f:
        f.write("# t x y p\n")
        for row in zip(t, x, y, p):
            f.write("{:.6f} {} {} {}\n".format(*row))


class TestSynthesis:
    def test_read_simulator_txt_polarity_mapping(self, tmp_path):
        p = str(tmp_path / "a.txt")
        write_sim_txt(p, 100, 8, 8, 0)
        ev = synthesis.read_simulator_txt(p)
        assert ev.shape == (100, 4)
        assert set(np.unique(ev[:, 3])) <= {-1.0, 1.0}  # 0 -> -1
        assert (np.diff(ev[:, 2]) >= 0).all()

    def test_nfs_preset_end_to_end(self, tmp_path):
        root = tmp_path / "sim"
        for scale_dir, n in [("down2", 4000), ("down4", 1000), ("down8", 250), ("down16", 64)]:
            d = root / scale_dir
            d.mkdir(parents=True)
            for seq in ("s0", "s1"):
                write_sim_txt(str(d / f"{seq}.txt"), n, 360 // 2, 640 // 2, hash(seq) % 100)
        outs = synthesis.synthesize_dataset(str(root), str(tmp_path / "h5"), "nfs")
        assert len(outs) == 2
        with h5py.File(outs[0], "r") as f:
            assert list(f.attrs["sensor_resolution"]) == [360, 640]
            # relabeling: simulated down2 -> ori group
            assert f["ori_events/ts"].shape[0] == 4000
            assert f["down8_events/ts"].shape[0] == 64
        # the produced file round-trips through the dataset layer
        ds = EventH5Dataset(
            outs[0],
            DatasetConfig(
                scale=2, ori_scale="down2", window=64, sliding_window=32,
                sequence=SequenceConfig(2, 2, 2),
            ),
        )
        item = ds.get_window(0, seed=0)
        assert item["inp_len"] == 64

    def test_unaligned_counts_raise(self, tmp_path):
        root = tmp_path / "bad"
        (root / "down2").mkdir(parents=True)
        (root / "down4").mkdir()
        (root / "down8").mkdir()
        (root / "down16").mkdir()
        write_sim_txt(str(root / "down2" / "s.txt"), 10, 8, 8, 0)
        with pytest.raises(ValueError, match="unaligned"):
            synthesis.synthesize_dataset(str(root), str(tmp_path / "o"), "nfs")

    def test_txt_memmap_attr_inspect(self, tmp_path):
        txt = str(tmp_path / "x.txt")
        write_sim_txt(txt, 50, 16, 16, 1)
        h5p = synthesis.txt_to_h5(txt, str(tmp_path / "x.h5"), [16, 16])
        mm = synthesis.h5_to_memmap(h5p, str(tmp_path / "mm"))
        assert os.path.exists(mm["ts"])
        synthesis.add_hdf5_attribute(h5p, "note", "hello")
        summary = synthesis.read_events_summary(h5p)
        assert summary["ori_events"]["num_events"] == 50
        assert summary["attrs"]["note"] == "hello"
