"""Checkpoint/resume + observability tests."""

import struct

import jax
import numpy as np
import pytest

from depgan_tpu.config import DataConfig, GanTrainConfig, ModelConfig
from depgan_tpu.train import Counters, GanTrainer
from depgan_tpu.utils import tb_writer as tb
from depgan_tpu.utils.logging import Logger, LossHistory


class TestCheckpoint:
    def test_gan_state_roundtrip(self, tmp_path):
        from depgan_tpu.io.checkpoint import CheckpointManager

        cfg = ModelConfig(image_size=16, first_fm=4)
        trainer = GanTrainer(cfg, GanTrainConfig(batch_size=2, d_iters=1,
                                                 warmup_d_iters=2, k_noise=2),
                             DataConfig())
        state = trainer.init_state(jax.random.key(0))
        counters = Counters(gen_iterations=7, crit_iterations=35)

        mgr = CheckpointManager(tmp_path / "ckpt")
        mgr.save(7, state, counters, extra={"fold": 2})
        template = trainer.init_state(jax.random.key(99))
        restored, rcounters, extra = mgr.restore(template)
        mgr.close()

        assert rcounters.gen_iterations == 7
        assert rcounters.crit_iterations == 35
        assert extra == {"fold": 2}
        for a, b in zip(jax.tree.leaves(state.g_params), jax.tree.leaves(restored.g_params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(state.dy2_opt), jax.tree.leaves(restored.dy2_opt)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_latest_step_and_retention(self, tmp_path):
        from depgan_tpu.io.checkpoint import CheckpointManager

        cfg = ModelConfig(image_size=16, first_fm=4)
        trainer = GanTrainer(cfg, GanTrainConfig(batch_size=2, d_iters=1,
                                                 warmup_d_iters=2, k_noise=2),
                             DataConfig())
        state = trainer.init_state(jax.random.key(0))
        mgr = CheckpointManager(tmp_path / "ckpt", max_to_keep=2)
        for step in (1, 2, 3):
            mgr.save(step, state, Counters(gen_iterations=step))
        assert mgr.latest_step() == 3
        _, c, _ = mgr.restore(state)
        assert c.gen_iterations == 3
        mgr.close()

    def test_h5_export_hook(self, tmp_path):
        from depgan_tpu.io.checkpoint import export_generator_h5
        from depgan_tpu.io.h5_import import import_keras_h5
        from depgan_tpu.models import init_generator

        cfg = ModelConfig(image_size=16, first_fm=4)
        trainer = GanTrainer(cfg, GanTrainConfig(batch_size=2, d_iters=1,
                                                 warmup_d_iters=2, k_noise=2),
                             DataConfig())
        state = trainer.init_state(jax.random.key(0))
        p = tmp_path / "netG.h5"
        export_generator_h5(state, p)
        _, fresh = init_generator(cfg, jax.random.key(5))
        imported = import_keras_h5(str(p), fresh)
        a = jax.tree.leaves(state.g_params)[0]
        b = jax.tree.leaves(imported["params"])[0]
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestCrc32c:
    def test_known_vectors(self):
        # RFC 3720 test vector: 32 bytes of zeros -> 0x8a9136aa.
        assert tb.crc32c(b"\x00" * 32) == 0x8A9136AA
        assert tb.crc32c(b"\xff" * 32) == 0x62A8AB43
        assert tb.crc32c(bytes(range(32))) == 0x46DD794E


class TestVarint:
    def test_varint_encoding(self):
        assert tb._varint(0) == b"\x00"
        assert tb._varint(1) == b"\x01"
        assert tb._varint(300) == b"\xac\x02"


class TestEventFile:
    def test_tensorboard_can_parse_our_events(self, tmp_path):
        """Parse our hand-encoded records with tensorboard's own proto
        definitions — an independent decoder."""
        logger = Logger(tmp_path)
        logger.log_scalar("loss/total", 1.5, step=3)
        logger.log_histogram("weights", np.random.default_rng(0).normal(size=100), step=4)
        img = np.random.default_rng(1).uniform(-1, 1, (8, 8, 1))
        logger.log_images("val", [img], step=5)
        logger.close()

        from tensorboard.compat.proto.event_pb2 import Event

        files = list(tmp_path.glob("events.out.tfevents.*"))
        assert len(files) == 1
        raw = files[0].read_bytes()
        events = []
        off = 0
        while off < len(raw):
            (length,) = struct.unpack_from("<Q", raw, off)
            lcrc = struct.unpack_from("<I", raw, off + 8)[0]
            assert lcrc == tb._masked_crc(raw[off : off + 8])
            payload = raw[off + 12 : off + 12 + length]
            pcrc = struct.unpack_from("<I", raw, off + 12 + length)[0]
            assert pcrc == tb._masked_crc(payload)
            ev = Event()
            ev.ParseFromString(payload)
            events.append(ev)
            off += 12 + length + 4

        assert events[0].file_version == "brain.Event:2"
        scalars = [e for e in events if e.summary.value and e.summary.value[0].HasField("simple_value")]
        assert scalars[0].summary.value[0].tag == "loss/total"
        assert scalars[0].summary.value[0].simple_value == pytest.approx(1.5)
        assert scalars[0].step == 3
        histos = [e for e in events if e.summary.value and e.summary.value[0].HasField("histo")]
        assert histos[0].summary.value[0].histo.num == pytest.approx(100.0)
        images = [e for e in events if e.summary.value and e.summary.value[0].HasField("image")]
        assert images[0].summary.value[0].image.height == 8
        assert images[0].summary.value[0].image.encoded_image_string.startswith(b"\x89PNG")


class TestLossHistory:
    def test_append_accumulates(self, tmp_path):
        h = LossHistory(tmp_path / "loss.txt")
        h.append(1.0)
        h.append([2.0, 3.0])
        np.testing.assert_allclose(np.loadtxt(tmp_path / "loss.txt"), [1, 2, 3])
