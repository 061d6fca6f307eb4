"""Training subsystem tests: WGAN-GP properties (SURVEY.md §4d), superstep
mechanics, and supervised-trainer convergence on tiny synthetic data."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from depgan_tpu.config import DataConfig, GanTrainConfig, ModelConfig, UResNetTrainConfig
from depgan_tpu.train import Counters, GanTrainer, UResNetTrainer
from depgan_tpu.train.wgan_gp import (
    critic_step_loss,
    dice_coef,
    generator_loss,
    gradient_penalty,
    wmh_mask,
)

SZ = 16
MODEL_CFG = ModelConfig(image_size=SZ, first_fm=4, n_input_channels=1)
GAN_CFG = GanTrainConfig(
    batch_size=4, d_iters=2, warmup_d_iters=3, warmup_until=1, warmup_every=1000,
    k_noise=3, validate_every=1000,
)


class TestWganGpProperties:
    def test_gp_zero_for_unit_linear_critic(self):
        """A critic f(x) = <x, w>/||w|| * anything with ||grad|| == 1 has
        zero penalty — here f(x) = sum(x)/sqrt(N) gives ||grad|| = 1."""
        n = SZ * SZ

        def critic_fn(x):
            return jnp.sum(x, axis=(1, 2, 3), keepdims=False)[:, None] / jnp.sqrt(n)

        real = jax.random.normal(jax.random.key(0), (4, SZ, SZ, 1))
        fake = jax.random.normal(jax.random.key(1), (4, SZ, SZ, 1))
        eps = jax.random.uniform(jax.random.key(2), (4, 1, 1, 1))
        gp = gradient_penalty(critic_fn, real, fake, eps)
        assert float(gp) == pytest.approx(0.0, abs=1e-10)

    def test_gp_positive_for_steep_critic(self):
        def critic_fn(x):
            return 100.0 * jnp.sum(x, axis=(1, 2, 3))[:, None]

        real = jnp.zeros((2, SZ, SZ, 1))
        fake = jnp.ones((2, SZ, SZ, 1))
        eps = jnp.full((2, 1, 1, 1), 0.5)
        gp = gradient_penalty(critic_fn, real, fake, eps)
        # ||grad|| = 100*sqrt(N) >> 1.
        assert float(gp) == pytest.approx((100 * SZ - 1) ** 2, rel=1e-5)

    def test_critic_loss_signs(self):
        """Critic loss decreases when real scores rise above fake scores."""

        def make_critic(bias_real):
            def critic_fn(x):
                # score = bias_real * mean(x): real patches crafted > fake.
                return bias_real * jnp.mean(x, axis=(1, 2, 3), keepdims=False)[:, None]
            return critic_fn

        real = jnp.ones((2, SZ, SZ, 1))
        fake = -jnp.ones((2, SZ, SZ, 1))
        eps = jnp.full((2, 1, 1, 1), 0.5)
        loss_good, (lr, lf) = critic_step_loss(make_critic(1.0), real, fake, eps, 0.0)
        loss_bad, _ = critic_step_loss(make_critic(-1.0), real, fake, eps, 0.0)
        assert float(loss_good) < float(loss_bad)
        assert float(lr) == pytest.approx(1.0)
        assert float(lf) == pytest.approx(-1.0)

    def test_hard_threshold_has_zero_gradient(self):
        """Faithful quirk: the volume/Dice terms exert no gradient pressure
        (reference :581-589)."""
        cfg = GanTrainConfig(threshold_mode="hard", l1_weight=0.0)

        def loss_of_dem(dem):
            loss, _ = generator_loss(
                cfg, 0.5, dem, jnp.zeros_like(dem), jnp.ones_like(dem),
                lambda x: jnp.zeros((dem.shape[0], 1)),
                lambda x: jnp.zeros((dem.shape[0], 1)),
            )
            return loss

        dem = jax.random.uniform(jax.random.key(0), (2, SZ, SZ, 1))
        g = jax.grad(loss_of_dem)(dem)
        assert float(jnp.max(jnp.abs(g))) == 0.0

    def test_soft_threshold_has_gradient(self):
        cfg = GanTrainConfig(threshold_mode="soft", l1_weight=0.0)

        def loss_of_dem(dem):
            loss, _ = generator_loss(
                cfg, 0.5, dem, jnp.zeros_like(dem), jnp.ones_like(dem),
                lambda x: jnp.zeros((dem.shape[0], 1)),
                lambda x: jnp.zeros((dem.shape[0], 1)),
            )
            return loss

        dem = jax.random.uniform(jax.random.key(0), (2, SZ, SZ, 1))
        g = jax.grad(loss_of_dem)(dem)
        assert float(jnp.max(jnp.abs(g))) > 0.0

    def test_generator_loss_terms(self):
        cfg = GanTrainConfig()
        dem = jnp.full((1, SZ, SZ, 1), 0.25)
        y1 = jnp.zeros((1, SZ, SZ, 1))
        y2 = jnp.full((1, SZ, SZ, 1), 0.75)
        c10 = lambda x: jnp.full((1, 1), 10.0)
        c2 = lambda x: jnp.full((1, 1), 2.0)
        loss, aux = generator_loss(cfg, 0.5, dem, y1, y2, c10, c2)
        # L1 = |0.25 - 0.75| * 100 = 50; critic terms -10 - 2.
        assert float(aux["errG_MSE"]) == pytest.approx(50.0, rel=1e-5)
        # real mask all 1 (0.75 >= .5), fake mask all 0 -> dice ~ 0, loss ~ 1.
        assert float(aux["errG_WMH"]) == pytest.approx(1.0, abs=1e-3)
        n = SZ * SZ
        assert float(aux["errG_VOL"]) == pytest.approx((n / 1000.0) ** 2 * 100, rel=1e-4)
        assert float(loss) == pytest.approx(
            -10 - 2 + 50 + float(aux["errG_VOL"]) + float(aux["errG_WMH"]), rel=1e-5
        )

    def test_dice_coef_identity(self):
        x = jnp.ones((2, 4, 4, 1))
        assert float(dice_coef(x, x)) == pytest.approx(1.0, rel=1e-6)

    def test_wmh_mask_modes(self):
        x = jnp.asarray([0.0, 0.49, 0.5, 1.0])
        np.testing.assert_array_equal(
            np.asarray(wmh_mask(x, 0.5, "hard", 0.02)), [0, 0, 1, 1]
        )
        soft = np.asarray(wmh_mask(x, 0.5, "soft", 0.02))
        assert soft[0] < 0.01 and soft[3] > 0.99 and soft[2] == pytest.approx(0.5)


def synth_gan_data(n=24, sz=SZ, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.uniform(0, 1, (n, sz, sz, 1)).astype(np.float32)
    y = np.clip(x + rng.normal(0, 0.1, (n, sz, sz, 1)), 0, 1).astype(np.float32)
    return x, y


class TestGanSuperstep:
    @pytest.fixture(scope="class")
    def trainer(self):
        return GanTrainer(MODEL_CFG, GAN_CFG, DataConfig())

    def test_superstep_updates_all_networks(self, trainer):
        state = trainer.init_state(jax.random.key(0))
        x, y = synth_gan_data()
        x_all, y_all = jnp.asarray(x), jnp.asarray(y)
        idx = np.arange(8, dtype=np.int32).reshape(2, 4)
        before = jax.tree.map(np.asarray, (state.g_params, state.dy2_params, state.ddem_params))
        state2, metrics = trainer.superstep(
            state, x_all, y_all, idx, n_valid=2, key=jax.random.key(1)
        )
        after = (state2.g_params, state2.dy2_params, state2.ddem_params)
        for b_tree, a_tree, name in zip(before, after, ("G", "D_y2", "D_dem")):
            diffs = jax.tree.map(
                lambda b, a: float(jnp.max(jnp.abs(jnp.asarray(a) - jnp.asarray(b)))),
                b_tree, jax.tree.map(np.asarray, a_tree),
            )
            assert max(jax.tree.leaves(diffs)) > 0, f"{name} params unchanged"
        assert np.asarray(metrics["crit_y2_real"]).shape == (2,)
        assert np.isfinite(float(metrics["gen"]["errG"]))

    def test_masked_tail_iterations_do_not_update(self, trainer):
        """With n_valid=1 of D=2, the second critic iteration must be a
        no-op: running (D=2, n_valid=1) equals running (D=2, n_valid=1)
        deterministically, and critic params after step differ from a
        2-valid run."""
        x, y = synth_gan_data()
        x_all, y_all = jnp.asarray(x), jnp.asarray(y)
        idx = np.arange(8, dtype=np.int32).reshape(2, 4)
        k = jax.random.key(3)
        s0 = trainer.init_state(jax.random.key(0))
        s_full, _ = trainer.superstep(s0, x_all, y_all, idx, n_valid=2, key=k)
        s0 = trainer.init_state(jax.random.key(0))
        s_part, _ = trainer.superstep(s0, x_all, y_all, idx, n_valid=1, key=k)
        d_full = jax.tree.leaves(s_full.dy2_params)[0]
        d_part = jax.tree.leaves(s_part.dy2_params)[0]
        assert float(jnp.max(jnp.abs(d_full - d_part))) > 0

    def test_fused_pallas_superstep_matches_flax(self):
        """use_pallas=True (frozen BN) routes the no-gradient generator
        forwards through the folded-BN fused s2d path; the trajectory must
        match the plain Flax superstep to conv-rounding tolerance."""
        import dataclasses

        x, y = synth_gan_data()
        x_all, y_all = jnp.asarray(x), jnp.asarray(y)
        idx = np.arange(8, dtype=np.int32).reshape(2, 4)
        k = jax.random.key(7)

        results = []
        for use_pallas, tail in ((False, False), (True, False), (True, True)):
            mcfg = dataclasses.replace(MODEL_CFG, use_pallas=use_pallas,
                                       critic_tail_s2d=tail)
            tr = GanTrainer(mcfg, GAN_CFG, DataConfig())
            s0 = tr.init_state(jax.random.key(0))
            s1, metrics = tr.superstep(s0, x_all, y_all, idx, n_valid=2, key=k)
            results.append((s1, metrics))
        (s_plain, m_plain) = results[0]

        for s_fused, m_fused in results[1:]:
            for tree_a, tree_b in (
                (s_plain.g_params, s_fused.g_params),
                (s_plain.dy2_params, s_fused.dy2_params),
                (s_plain.ddem_params, s_fused.ddem_params),
            ):
                jax.tree.map(
                    lambda a, b: np.testing.assert_allclose(
                        np.asarray(a), np.asarray(b), atol=5e-3
                    ),
                    tree_a, tree_b,
                )
            np.testing.assert_allclose(
                float(m_plain["gen"]["errG"]), float(m_fused["gen"]["errG"]),
                rtol=0.05, atol=0.05,
            )
            assert int(m_plain["best_noise_idx"]) == int(
                m_fused["best_noise_idx"])

    def test_batch_bn_mode_updates_generator_stats(self):
        """bn_mode='batch': the generator update uses batch statistics and
        updates the moving stats (unlike the reference-faithful 'frozen')."""
        cfg = GanTrainConfig(batch_size=4, d_iters=1, warmup_d_iters=2,
                             warmup_until=0, warmup_every=10_000, k_noise=2,
                             bn_mode="batch", validate_every=1000)
        trainer = GanTrainer(MODEL_CFG, cfg, DataConfig())
        state = trainer.init_state(jax.random.key(0))
        before = np.asarray(
            state.g_stats["block_gen_0"]["bn_gen_0"]["mean"]
        ).copy()
        x, y = synth_gan_data(12)
        idx = np.arange(8, dtype=np.int32).reshape(2, 4)
        state, _ = trainer.superstep(
            state, jnp.asarray(x), jnp.asarray(y), idx, 2, jax.random.key(1)
        )
        after = np.asarray(state.g_stats["block_gen_0"]["bn_gen_0"]["mean"])
        assert np.max(np.abs(after - before)) > 0

    def test_frozen_bn_mode_keeps_stats(self, trainer):
        # default bn_mode is 'frozen' — reuse the class fixture's compiled
        # superstep instead of re-jitting an identical trainer (Weak r2#8).
        state = trainer.init_state(jax.random.key(0))
        before = np.asarray(state.g_stats["block_gen_0"]["bn_gen_0"]["mean"]).copy()
        x, y = synth_gan_data(12)
        idx = np.arange(8, dtype=np.int32).reshape(2, 4)
        state, _ = trainer.superstep(
            state, jnp.asarray(x), jnp.asarray(y), idx, 2, jax.random.key(1)
        )
        after = np.asarray(state.g_stats["block_gen_0"]["bn_gen_0"]["mean"])
        np.testing.assert_array_equal(before, after)

    def test_warmup_schedule(self, trainer):
        c = Counters()
        assert trainer._d_iters_for(c) == GAN_CFG.warmup_d_iters  # gen_it 0 < 1
        c = c.replace(gen_iterations=5)
        assert trainer._d_iters_for(c) == GAN_CFG.d_iters
        c = c.replace(gen_iterations=1000)  # % warmup_every == 0
        assert trainer._d_iters_for(c) == GAN_CFG.warmup_d_iters

    def test_fit_fold_one_epoch(self, trainer, tmp_path):
        x, y = synth_gan_data(n=20)
        xv, yv = synth_gan_data(n=4, seed=9)
        state = trainer.init_state(jax.random.key(0))
        counters = Counters(gen_iterations=5)  # skip warm-up for speed
        ckpts = []
        state, counters = trainer.fit_fold(
            state, counters, x, y, xv, yv, n_epochs=1,
            checkpoint_fn=lambda s, c: ckpts.append(c.gen_iterations),
        )
        # 5 batches of 4 from 20 slices, D=2 -> ceil(5/2) = 3 supersteps.
        assert counters.gen_iterations == 5 + 3
        assert counters.crit_iterations == 5

    def test_buffered_metric_streams_match_per_step_flush(self, trainer):
        """Deferred metric fetch + chunked dispatch (scan-of-supersteps)
        must reproduce the sequential per-step-flush run: same
        (tag, step) streams in the same order, same values and final state
        (to float tolerance — the chunk program is a separate XLA
        compilation of the same math), including across a validation
        flush and an epoch-tail partial superstep."""
        import dataclasses

        x, y = synth_gan_data(n=20)
        xv, yv = synth_gan_data(n=4, seed=9)

        def run(flush_every, chunk):
            captured = []

            class Cap:
                def log_scalar(self, tag, v, step):
                    if not tag.startswith("perf/"):  # wall-time, not values
                        captured.append((tag, float(v), step))

                def log_images(self, *a, **k):
                    pass

                def log_graph(self, *a, **k):
                    pass

            orig = trainer.cfg
            trainer.cfg = dataclasses.replace(
                orig, metric_flush_every=flush_every, validate_every=2,
                dispatch_chunk=chunk,
            )
            try:
                state = trainer.init_state(jax.random.key(0))
                state, _ = trainer.fit_fold(
                    state, Counters(gen_iterations=5), x, y, xv, yv,
                    n_epochs=1, logger=Cap(), seed=3,
                )
            finally:
                trainer.cfg = orig
            fp = float(
                sum(float(jnp.sum(jnp.abs(l)))
                    for l in jax.tree.leaves(state.g_params))
            )
            return captured, fp

        buffered, fp_b = run(10_000, 0)  # auto chunking, one final flush
        eager, fp_e = run(1, 1)          # per-step dispatch + fetch
        assert [(t, s) for t, _, s in buffered] == [(t, s) for t, _, s in eager]
        np.testing.assert_allclose(
            [v for _, v, _ in buffered], [v for _, v, _ in eager],
            rtol=1e-4, atol=1e-6,
        )
        np.testing.assert_allclose(fp_b, fp_e, rtol=1e-5)

    def test_val_step_values_pinned_with_stub_models(self, trainer):
        """Hand-computed validation scores (reference :845-847). The key
        faithfulness pin: `val_D_real_generated_loss` scores the critic on
        the RAW generator output (the DEM) — `netD_y2.predict(netG.predict(
        [x_val, fixed_noise]))` at reference :847 — NOT on the reconstructed
        follow-up ``dem + y1``."""

        class StubCritic:
            def apply(self, variables, img):
                return 2.0 * jnp.sum(img, axis=(1, 2, 3))[:, None]

        class StubGen:
            def apply(self, variables, x, z, train=False):
                return 0.5 * x[..., :1] - 0.25

        tr = GanTrainer(MODEL_CFG, GAN_CFG, DataConfig())
        tr.critic, tr.gen = StubCritic(), StubGen()
        val_step = tr._build_val_step()

        n = 4
        rng = np.random.default_rng(11)
        x_val = jnp.asarray(rng.uniform(0, 1, (n, SZ, SZ, 1)), jnp.float32)
        y2_val = jnp.asarray(rng.uniform(0, 1, (n, SZ, SZ, 1)), jnp.float32)
        noise = jnp.zeros((n, 32, 1), jnp.float32)
        state = trainer.init_state(jax.random.key(0))  # stubs ignore params

        d_fake, d_real, d_gen, val_dem = val_step(state, x_val, y2_val, noise)
        per_sample = lambda a: 2.0 * np.sum(np.asarray(a), axis=(1, 2, 3))
        assert float(d_fake) == pytest.approx(per_sample(x_val).mean(), rel=1e-5)
        assert float(d_real) == pytest.approx(per_sample(y2_val).mean(), rel=1e-5)
        dem = 0.5 * np.asarray(x_val) - 0.25
        np.testing.assert_allclose(np.asarray(val_dem), dem, rtol=1e-5)
        expect_gen = per_sample(dem).mean()
        wrong_gen = per_sample(dem + np.asarray(x_val)).mean()  # the old bug
        assert float(d_gen) == pytest.approx(expect_gen, rel=1e-5)
        assert abs(expect_gen - wrong_gen) > 1e-3  # the pin distinguishes them


class TestUResNetTrainer:
    def test_step_loss_decreases_on_learnable_task(self):
        """Drive the jitted train step directly on a pixelwise-threshold
        task (learnable by a translation-equivariant net) and require a
        monotonic-ish loss decrease."""
        from depgan_tpu.data.preprocess import one_hot

        cfg = ModelConfig(image_size=SZ, first_fm=4, n_out=4, dropout_mode="none")
        trainer = UResNetTrainer(cfg, UResNetTrainConfig(batch_size=8, lr=1e-3))
        rng = np.random.default_rng(0)
        n = 16
        x = rng.normal(size=(n, SZ, SZ, 1)).astype(np.float32)
        labels = np.digitize(x, [-0.6, 0.0, 0.6]).astype(np.int32)
        y1h = jnp.asarray(
            one_hot(labels, 4).astype(np.float32).reshape(labels.shape[:-1] + (4,))
        )
        xj = jnp.asarray(x)
        state = trainer.init_state(jax.random.key(0))
        key = jax.random.key(0)
        losses = []
        for step in range(40):
            idx = jnp.asarray((np.arange(8) + (step % 2) * 8).astype(np.int32))
            key, nk, dk = jax.random.split(key, 3)
            state, loss = trainer._step(
                state, xj, y1h, jax.random.normal(nk, (n, 32, 1)), idx, dk
            )
            losses.append(float(loss))
        assert losses[-1] < losses[0] - 0.1

    def test_fit_mechanics(self, tmp_path):
        """fit() epoch loop: counters, histories, checkpoints, val loss."""
        from depgan_tpu.utils.logging import LossHistory

        cfg = ModelConfig(image_size=SZ, first_fm=4, n_out=4, dropout_mode="uresnet")
        trainer = UResNetTrainer(cfg, UResNetTrainConfig(batch_size=8))
        rng = np.random.default_rng(0)
        x = rng.normal(size=(16, SZ, SZ, 1)).astype(np.float32)
        labels = np.digitize(x, [0.0]).astype(np.int32)
        state = trainer.init_state(jax.random.key(0))
        from collections import defaultdict

        seen = defaultdict(list)

        class Cap:
            def log_scalar(self, tag, v, step):
                seen[tag].append(v)

        ckpts = []
        state = trainer.fit(
            state, x, labels, x[:4], labels[:4], n_epochs=2, logger=Cap(),
            loss_history=LossHistory(tmp_path / "loss.txt"),
            val_loss_history=LossHistory(tmp_path / "val_loss.txt"),
            checkpoint_fn=lambda s, e: ckpts.append(e),
        )
        assert state.epoch == 2
        assert len(seen["loss"]) == 2 and len(seen["val_loss"]) == 2
        assert all(np.isfinite(v) for v in seen["loss"] + seen["val_loss"])
        # profiling is wired (utils/profiling.StepTimer -> perf/* scalars)
        assert len(seen["perf/steps_per_sec"]) == 2
        assert np.loadtxt(tmp_path / "loss.txt").shape == (2,)
        assert ckpts == [0, 1]  # checkpoint_every=1 (reference saves each epoch)

    def test_chunked_dispatch_matches_eager(self, tmp_path):
        """dispatch_chunk>1 (scan-of-batches per device call, incl. a
        remainder chunk) must reproduce the per-batch dispatch trajectory
        exactly: same dropout-key sequence, same loss history, same final
        params (VERDICT r3 item 6)."""
        def run(chunk):
            cfg = ModelConfig(image_size=SZ, first_fm=4, n_out=4,
                              dropout_mode="uresnet")
            trainer = UResNetTrainer(
                cfg, UResNetTrainConfig(batch_size=4, dispatch_chunk=chunk))
            rng = np.random.default_rng(0)
            x = rng.normal(size=(20, SZ, SZ, 1)).astype(np.float32)
            labels = np.digitize(x, [0.0]).astype(np.int32)
            state = trainer.init_state(jax.random.key(0))
            hist = []

            class Cap:
                def log_scalar(self, tag, v, step):
                    if tag in ("loss", "val_loss"):
                        hist.append((tag, step, v))

            state = trainer.fit(
                state, x, labels, x[:4], labels[:4], n_epochs=2, logger=Cap()
            )
            return hist, state

        h1, s1 = run(1)       # per-batch dispatch (the round-3 path)
        h3, s3 = run(3)       # 5 batches/epoch -> chunks of 3 + 2
        assert [(t, s) for t, s, _ in h1] == [(t, s) for t, s, _ in h3]
        # Float tolerance, not bit identity: the chunk program is a separate
        # XLA compilation of the same math (same convention as
        # test_buffered_metric_streams_match_per_step_flush). Per-param
        # bound: Adam moves a near-zero-gradient param by ~±lr per update
        # regardless of the gradient's rounding-level sign, so two
        # compilations can walk such a param apart by up to
        # n_updates * lr; the loss histories (rtol 2e-4) and the aggregate
        # L1 sum (rtol 1e-4) are what actually pin the trajectory.
        np.testing.assert_allclose(
            [v for *_, v in h1], [v for *_, v in h3], rtol=2e-4, atol=1e-6)
        lr = UResNetTrainConfig().lr
        n_updates = 2 * 5  # epochs x batches
        for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s3.params)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1.1 * n_updates * lr)
        fp = lambda s: float(sum(float(jnp.sum(jnp.abs(l)))
                                 for l in jax.tree.leaves(s.params)))
        np.testing.assert_allclose(fp(s1), fp(s3), rtol=1e-4)

    def test_chunked_val_step_matches_single_apply(self):
        """The lax.map-chunked val CCE (memory = one chunk's forward) must
        equal the whole-set single-apply mean, including at a val size
        that does NOT divide the chunk size (masked remainder)."""
        from depgan_tpu.train.uresnet_trainer import categorical_crossentropy

        cfg = ModelConfig(image_size=SZ, first_fm=4, n_out=4, dropout_mode="none")
        trainer = UResNetTrainer(cfg, UResNetTrainConfig(batch_size=4))
        state = trainer.init_state(jax.random.key(0))
        rng = np.random.default_rng(1)
        n = 7  # 2 chunks of 4, one padded element masked out
        x = jnp.asarray(rng.normal(size=(n, SZ, SZ, 1)).astype(np.float32))
        noise = jnp.asarray(rng.normal(size=(n, 32, 1)).astype(np.float32))
        labels = np.digitize(np.asarray(x), [0.0]).astype(np.int32)
        from depgan_tpu.data.preprocess import one_hot

        y = jnp.asarray(
            one_hot(labels, 4).astype(np.float32).reshape(labels.shape[:-1] + (4,))
        )
        chunked = float(trainer._val_step(state, x, noise, y))
        out = trainer.model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            x, noise, train=False,
        )
        single = float(categorical_crossentropy(out, y))
        assert chunked == pytest.approx(single, rel=1e-6)

    def test_categorical_crossentropy_matches_reference_def(self):
        from depgan_tpu.train.uresnet_trainer import categorical_crossentropy

        probs = jnp.asarray([[0.7, 0.2, 0.1], [0.1, 0.8, 0.1]])
        y = jnp.asarray([[1.0, 0, 0], [0, 1.0, 0]])
        expected = -(np.log(0.7) + np.log(0.8)) / 2
        assert float(categorical_crossentropy(probs, y)) == pytest.approx(expected, rel=1e-5)
