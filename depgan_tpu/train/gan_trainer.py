"""DEP-GAN two-critic WGAN-GP trainer.

Reference behaviour (`...twoCritics_training_4fold.py:506-894`), re-designed
for TPU execution:

- The reference's hot loop makes 10-200 graph executions per generator step
  (5-100 critic updates per critic, a 10x noise-probe, each a host round
  trip). Here one **superstep** = one jitted call: ``lax.scan`` over the
  critic-Y2 updates, ``lax.scan`` over the critic-DEM updates, a ``vmap``'d
  best-of-k noise probe, and the generator update — everything on device.
- The fold's slice data lives in HBM; supersteps receive only (D, B) index
  stacks and gather on device.
- Warm-up (100 critic iters when gen_iterations < 25 or % 500 == 0,
  reference :792-797) selects a second compiled superstep with D=100 —
  exactly two compiled variants, no recompile churn.
- Epoch tails: the reference's inner loops stop early when the epoch runs
  out of batches (``while j < Diters and i < batches``, reference :802).
  Supersteps keep static shapes and mask those iterations out instead
  (update = select(valid, new, old)).
- Both critic loops sweep the *same* batch positions, and the generator
  trains on the last of them, matching the reference's i/ii bookkeeping
  (reference :802-829, :873-878).
- Best-of-k noise (reference :868-878): k probes of the generator loss with
  independent noise, vmapped into one device call; train on the argmin.
- BN/Dropout: the reference's K.function graphs run at Keras learning-phase
  0, so BN uses its never-updated moving stats and Dropout is off —
  ``bn_mode='frozen'`` (default) reproduces that; ``'batch'`` trains BN
  properly (see GanTrainConfig).
- Counters are global across folds unless ``reset_counters_per_fold``
  (faithful quirk, reference :47-49).
"""

from __future__ import annotations

import time
from dataclasses import dataclass
import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import DataConfig, GanTrainConfig, ModelConfig
from ..data.pipeline import EpochShuffler
from ..models.critic import make_critic
from ..models.generator import make_generator
from ..parallel import mesh as meshlib
from ..utils.profiling import StepTimer
from .state import Counters, GanTrainState, tree_select
from .wgan_gp import critic_step_loss, generator_loss


_GEN_TAGS = [
    ("errG_losses", "errG"), ("errG_CY2_losses", "errG_CY2"),
    ("errG_DEM_losses", "errG_DEM"), ("errG_MSE_losses", "errG_MSE"),
    ("errG_VOL_losses", "errG_VOL"), ("errG_WMH_losses", "errG_WMH"),
]


_GEN_KEYS = tuple(k for _, k in _GEN_TAGS)


def pack_superstep_metrics(metrics):
    """Flatten one superstep's scalar metrics into ONE f32 vector.

    Every ``np.asarray``/``float`` of a device value is a separate blocking
    device->host round trip; ``log_superstep_metrics`` needs ~11 of them,
    which measured ~2.7 s/superstep of pure fetch overhead on the training
    wall through the remote-dispatch backend (scripts/fold_anchor.py,
    docs/PERF.md round 3) against 0.6 s of device compute. Packing lets
    ``fit_fold`` buffer the vectors of K supersteps (dispatch stays async)
    and fetch them later with a single transfer."""
    rows = [metrics["crit_y2_real"], metrics["crit_y2_fake"],
            metrics["crit_dem_real"], metrics["crit_dem_fake"]]
    gen = jnp.stack([metrics["gen"][k] for k in _GEN_KEYS])
    return jnp.concatenate(
        [jnp.asarray(r, jnp.float32).reshape(-1) for r in rows]
        + [gen.astype(jnp.float32)]
    )


def unpack_superstep_metrics(flat, d: int) -> dict:
    """Inverse of :func:`pack_superstep_metrics` on a HOST vector."""
    flat = np.asarray(flat)
    rows = flat[: 4 * d].reshape(4, d)
    gen = dict(zip(_GEN_KEYS, flat[4 * d : 4 * d + len(_GEN_KEYS)]))
    return {
        "crit_y2_real": rows[0], "crit_y2_fake": rows[1],
        "crit_dem_real": rows[2], "crit_dem_fake": rows[3], "gen": gen,
    }


def log_superstep_metrics(log, metrics, counters, n_valid, prefix: str = ""):
    """Emit the reference's full scalar tag set for one superstep
    (reference :811-886): per-critic-iteration errCrit_* streams, per-gen-
    iteration errDC_* snapshots and the 6 generator loss terms. ``prefix``
    namespaces the tags (multi-fold logs ``fold{k}/...``). Returns the
    generator aux dict as floats."""
    y2r = np.asarray(metrics["crit_y2_real"])[:n_valid]
    y2f = np.asarray(metrics["crit_y2_fake"])[:n_valid]
    dr = np.asarray(metrics["crit_dem_real"])[:n_valid]
    df = np.asarray(metrics["crit_dem_fake"])[:n_valid]
    for j in range(n_valid):
        log(prefix + "errCrit_aaLosses", y2r[j] - y2f[j], counters.crit_iterations + j)
        log(prefix + "errCrit_aReal_losses", y2r[j], counters.crit_iterations + j)
        log(prefix + "errCrit_aFake_losses", y2f[j], counters.crit_iterations + j)
        log(prefix + "errCrit_DEM_aaLosses", dr[j] - df[j], counters.crit_dem_iterations + j)
        log(prefix + "errCrit_DEM_aReal_losses", dr[j], counters.crit_dem_iterations + j)
        log(prefix + "errCrit_DEM_aFake_losses", df[j], counters.crit_dem_iterations + j)
    gi = counters.gen_iterations
    log(prefix + "errDC_aaLosses", y2r[-1] - y2f[-1], gi)
    log(prefix + "errDC_aReal_losses", y2r[-1], gi)
    log(prefix + "errDC_aFake_losses", y2f[-1], gi)
    log(prefix + "errDC_DEM_aaLosses", dr[-1] - df[-1], gi)
    log(prefix + "errDC_DEM_aReal_losses", dr[-1], gi)
    log(prefix + "errDC_DEM_aFake_losses", df[-1], gi)
    gen_aux = {k: float(v) for k, v in metrics["gen"].items()}
    for tag, kname in _GEN_TAGS:
        log(prefix + tag, gen_aux[kname], gi)
    return gen_aux


def plan_dispatch_chunk(i, n_batches, d, gen_iterations, cfg, chunk_len,
                        d_iters_for_gi, validates=True, checkpoints=True):
    """Plan ONE device dispatch: the supersteps from epoch position ``i``
    up to the first point the host genuinely needs the state back — a
    validation or checkpoint boundary, a D-schedule change, the epoch end,
    or ``chunk_len`` supersteps. The single source of truth for the chunk
    boundaries shared by ``GanTrainer.fit_fold`` and
    ``MultiFoldGanTrainer.fit`` — the trajectory-identity guarantees
    (tests/test_training.py, tests/test_multi_fold.py) depend on both
    trainers cutting chunks at exactly these points.

    Returns ``([(start, n_valid)], new_i)``: per planned superstep the epoch
    position of its first batch and how many of its D rows are real batches
    (epoch tails give short rows, reference :802).
    """
    plan = []
    gi_sim = gen_iterations
    while True:
        n_valid = min(d, n_batches - i)
        plan.append((i, n_valid))
        i += n_valid
        boundary = (
            (validates and gi_sim % cfg.validate_every == 0)
            or (checkpoints and (gi_sim + 1) % cfg.checkpoint_every == 0)
        )
        gi_sim += 1
        if (d != cfg.d_iters or chunk_len == 1 or boundary
                or len(plan) >= chunk_len or i >= n_batches
                or d_iters_for_gi(gi_sim) != d):
            break
    return plan, i


@dataclass
class SuperstepMetrics:
    """Everything the reference logs, at full per-iteration resolution."""

    crit_y2_real: np.ndarray  # (D,)
    crit_y2_fake: np.ndarray
    crit_dem_real: np.ndarray
    crit_dem_fake: np.ndarray
    n_valid: int
    gen: dict  # errG, errG_CY2, errG_DEM, errG_MSE, errG_VOL, errG_WMH
    best_noise_idx: int


class GanTrainer:
    def __init__(
        self,
        model_cfg: ModelConfig,
        train_cfg: GanTrainConfig,
        data_cfg: DataConfig | None = None,
        mesh=None,
        _inner: bool = False,
    ):
        self.model_cfg = model_cfg
        self.cfg = train_cfg
        self.threshold = (data_cfg or DataConfig()).wmh_threshold
        self.mesh = mesh
        # _inner: this trainer runs INSIDE the multi-fold trainer's
        # partial-manual shard_map (manual over `fold`, GSPMD-auto over
        # `data`): the in-jit constrain_batch pins still apply (that is the
        # per-fold data parallelism), but host-side device_puts are the
        # outer trainer's job (init_state is vmapped there).
        self._inner = _inner
        # Real data parallelism (SURVEY §2.7): batch leaves pinned to the
        # mesh's data axis inside the superstep; params stay replicated and
        # XLA inserts the gradient psum from the shardings alone.
        self._data_parallel = meshlib.data_parallel(mesh, train_cfg.batch_size)
        # Run the two independent critic inner loops merged (one batch-2B
        # generator forward + a vmapped stacked-params update per iteration)
        # instead of sequentially. Measured SLOWER on v5e (753 vs 607 ms
        # fused superstep — XLA lowers stacked-weight convs poorly); kept
        # as a knob. Must be set before the first superstep build.
        self.merge_critic_loops = False
        self.gen = make_generator(model_cfg)
        self.critic = make_critic(model_cfg)
        self.tx_d = optax.adam(train_cfg.lr_d, b1=train_cfg.adam_b1, b2=train_cfg.adam_b2)
        self.tx_g = optax.adam(train_cfg.lr_g, b1=train_cfg.adam_b1, b2=train_cfg.adam_b2)
        # Two compiled variants: normal (Diters) and warm-up (reference :792).
        # _superstep_fns are the pure (un-jitted) functions — reused by the
        # multi-fold trainer, which vmaps them over a fold axis.
        self._superstep_fns = {
            train_cfg.d_iters: self._build_superstep(train_cfg.d_iters),
            train_cfg.warmup_d_iters: self._build_superstep(train_cfg.warmup_d_iters),
        }
        self._steps = {
            d: jax.jit(fn, donate_argnums=0)
            for d, fn in self._superstep_fns.items()
        }
        self._val_step = self._build_val_step()
        # One dispatch per superstep to flatten the metrics; retraces once
        # per D variant. See pack_superstep_metrics for why.
        self._pack_metrics = jax.jit(pack_superstep_metrics)
        # Scan-of-supersteps chunk programs, compiled lazily per D variant
        # (fixed chunk length — padded dispatches reuse the same program).
        self._chunk_jits: dict = {}

    # ------------------------------------------------------------------ state

    def init_state(self, rng) -> GanTrainState:
        cfg = self.model_cfg
        k1, k2, k3 = jax.random.split(rng, 3)
        x = jnp.zeros((1, cfg.image_size, cfg.image_size, cfg.n_input_channels))
        z = jnp.zeros((1, cfg.noise_size, 1))
        img = jnp.zeros((1, cfg.image_size, cfg.image_size, 1))
        gvars = self.gen.init({"params": k1}, x, z, train=False)
        dy2 = self.critic.init({"params": k2}, img)["params"]
        ddem = self.critic.init({"params": k3}, img)["params"]
        state = GanTrainState(
            g_params=gvars["params"],
            g_stats=gvars.get("batch_stats", {}),
            g_opt=self.tx_g.init(gvars["params"]),
            dy2_params=dy2,
            dy2_opt=self.tx_d.init(dy2),
            ddem_params=ddem,
            ddem_opt=self.tx_d.init(ddem),
        )
        if self.mesh is not None and not self._inner:
            state = meshlib.put_replicated(state, self.mesh)
        return state

    # -------------------------------------------------------------- superstep

    def _build_superstep(self, d_iters: int):
        gen, critic = self.gen, self.critic
        cfg, threshold = self.cfg, self.threshold
        tx_d, tx_g = self.tx_d, self.tx_g
        batch_bn = cfg.bn_mode == "batch"
        if self._data_parallel:
            mesh = self.mesh
            shard_b = lambda a, axis=0: meshlib.constrain_batch(a, mesh, axis)
        else:
            shard_b = lambda a, axis=0: a

        # use_pallas + frozen BN: the whole superstep runs fused —
        # every generator forward (critic inner loops, best-of-k probe AND
        # the generator's own gradient, via the kernels' custom VJPs), and
        # the critic forwards/updates through ops/fast_critic.FusedCritic
        # (conv5x5 s2d levels 0-1; the WGAN-GP input gradient comes from
        # its hand-chained backward, so the GP double-backward needs only
        # first-order rules). Folding is exact for frozen BN; training
        # semantics are unchanged up to conv rounding (pinned by
        # tests/test_fused_grad.py and tests/test_fast_critic.py).
        use_fused = self.model_cfg.use_pallas and not batch_bn
        use_fused_critic = use_fused
        if use_fused:
            from ..ops.fast_critic import FusedCritic, critic_pallas_supported
            from ..ops.fast_gen import FusedGenerator

            fused = FusedGenerator(
                self.model_cfg, pallas_levels=(1, 2),
                compute_dtype=jnp.dtype(self.model_cfg.compute_dtype),
            )
            # Critic levels 0-1 (the MXU-starving 5x5 stacks) through the
            # conv5x5 s2d kernel; the WGAN-GP input gradient comes from the
            # hand-chained score_and_input_grad (first-order-only diff).
            # Gated on the validated Mosaic shape envelope (image 256 —
            # the critic's widths are fixed, only the image size varies).
            use_fused_critic = critic_pallas_supported(self.model_cfg)
            if use_fused_critic:
                fused_critic = FusedCritic(
                    self.model_cfg,
                    compute_dtype=jnp.dtype(self.model_cfg.compute_dtype),
                    tail_s2d=self.model_cfg.critic_tail_s2d,
                )

        def make_critic_fns(p):
            """(apply, input_grad) for live critic params p."""
            if use_fused_critic:
                return (
                    lambda img: fused_critic.forward(p, img),
                    lambda m: fused_critic.score_and_input_grad(p, m)[1],
                )
            return (lambda img: critic.apply({"params": p}, img), None)

        def make_gen_forward(state):
            """G forward as seen by the critic graphs — Keras learning-phase
            0 (frozen moving stats, no dropout), reference :533. Built once
            per superstep: the fused path folds the live params here so the
            fold runs once, not per critic iteration."""
            if use_fused:
                W = fused.build_weights(
                    {"params": state.g_params, "batch_stats": state.g_stats}
                )
                return lambda x, z: fused.forward(W, x, z)
            return lambda x, z: gen.apply(
                {"params": state.g_params, "batch_stats": state.g_stats},
                x, z, train=False,
            )

        def superstep(state, x_all, y_all, idx, valid, key):
            B = idx.shape[1]
            noise_shape = (d_iters, B, self.model_cfg.noise_size, 1)
            k_ny2, k_ey2, k_ndem, k_edem, k_probe, k_drop = jax.random.split(key, 6)
            gen_fwd = make_gen_forward(state)
            noises_y2 = shard_b(jax.random.normal(k_ny2, noise_shape), 1)
            eps_y2 = shard_b(jax.random.uniform(k_ey2, (d_iters, B, 1, 1, 1)), 1)
            noises_dem = shard_b(jax.random.normal(k_ndem, noise_shape), 1)
            eps_dem = shard_b(jax.random.uniform(k_edem, (d_iters, B, 1, 1, 1)), 1)

            # ONE gather each for the whole superstep's batches (round-4
            # anchor finding): gathering per critic iteration from the
            # device-resident fold (2*D+1 gathers of B rows from a ~1.3 GB
            # array) is what separated the 2.8 s training superstep from
            # the 0.607 s isolated one — the per-iteration dynamic gathers
            # dominate. (D, B, ...) here is a few hundred MB at worst
            # (D=100 warm-up) and the scan consumes static slices of it.
            xb = shard_b(x_all[idx], 1)
            yb = shard_b(y_all[idx], 1)

            # ---- critic inner loops (reference :802-829) ----
            # The reference runs the Y2 loop (:802-814) to completion, then
            # the DEM loop (:817-829); the two are INDEPENDENT — separate
            # params/optimizers, the generator frozen for both, noises and
            # batch indices pre-drawn above with the same keys either way —
            # so a merged side-by-side form (ONE batch-2B generator forward
            # feeding both fakes, the two updates as one vmapped step) is
            # trajectory-identical up to float reassociation. MEASURED ON
            # CHIP AND REJECTED as the default: the vmapped stacked-params
            # critic update lowers WORSE than two sequential scans — 753 vs
            # 607 ms/superstep fused, 1270 vs 1027 plain (batch 16, D=5,
            # v5e; docs/PERF.md round-3) — XLA cannot use the standard conv
            # path once the weights carry a leading stacked axis. Kept
            # behind ``merge_critic_loops`` for future hardware/compilers.
            def crit_body(carry, xs):
                params2, opt2 = carry  # leaves stacked (2, ...): [Y2, DEM]
                x, y2, z2, ep2, ok = xs  # z2 (2, B, nz, 1), ep2 (2, B,1,1,1)
                x = shard_b(x)
                y2 = shard_b(y2)
                y1 = x[..., :1]
                dem2 = gen_fwd(
                    jnp.concatenate([x, x]),
                    z2.reshape((-1,) + z2.shape[2:]),
                ).reshape((2,) + y1.shape)
                fakes = jnp.stack([y1 + dem2[0], dem2[1]])
                reals = jnp.stack([y2, y2 - y1])

                # The optimizer update must be vmapped too: adam's scalar
                # `count` becomes shape (2,), which does not broadcast
                # against stacked leaves outside vmap.
                def one_step(p, o, real, fake, ep):
                    def loss_fn(p):
                        cf, igf = make_critic_fns(p)
                        return critic_step_loss(
                            cf, real, fake, ep, cfg.gp_weight,
                            input_grad_fn=igf,
                        )

                    (_, (lr_, lf_)), grads = jax.value_and_grad(
                        loss_fn, has_aux=True
                    )(p)
                    ups, new_o = tx_d.update(grads, o, p)
                    return optax.apply_updates(p, ups), new_o, lr_, lf_

                new_params2, new_opt2, lr2, lf2 = jax.vmap(one_step)(
                    params2, opt2, reals, fakes, ep2
                )
                carry = (
                    tree_select(ok, new_params2, params2),
                    tree_select(ok, new_opt2, opt2),
                )
                return carry, (lr2, lf2)

            def crit_seq_body(which):
                """Sequential per-critic scan body: Y2 trains on follow-up
                images (fake = y1 + DEM), DEM on the raw change maps."""

                def body(carry, xs):
                    params, opt = carry
                    x, y2, z, ep, ok = xs
                    x = shard_b(x)
                    y2 = shard_b(y2)
                    y1 = x[..., :1]
                    dem = gen_fwd(x, z)
                    if which == "y2":
                        real, fake = y2, y1 + dem
                    else:
                        real, fake = y2 - y1, dem

                    def loss_fn(p):
                        cf, igf = make_critic_fns(p)
                        return critic_step_loss(
                            cf, real, fake, ep, cfg.gp_weight,
                            input_grad_fn=igf,
                        )

                    (_, (lr_, lf_)), grads = jax.value_and_grad(
                        loss_fn, has_aux=True
                    )(params)
                    ups, new_opt = tx_d.update(grads, opt, params)
                    carry = (
                        tree_select(ok, optax.apply_updates(params, ups), params),
                        tree_select(ok, new_opt, opt),
                    )
                    return carry, (lr_, lf_)

                return body

            if self.merge_critic_loops:
                stack2 = lambda a, b: jax.tree.map(
                    lambda u, v: jnp.stack([u, v]), a, b
                )
                unstack2 = lambda t, i: jax.tree.map(lambda a: a[i], t)
                params2 = stack2(state.dy2_params, state.ddem_params)
                opt2 = stack2(state.dy2_opt, state.ddem_opt)
                (params2, opt2), (lr2, lf2) = jax.lax.scan(
                    crit_body,
                    (params2, opt2),
                    (
                        xb,
                        yb,
                        jnp.stack([noises_y2, noises_dem], axis=1),
                        jnp.stack([eps_y2, eps_dem], axis=1),
                        valid,
                    ),
                )
                y2_real, y2_fake = lr2[:, 0], lf2[:, 0]
                dem_real_l, dem_fake_l = lr2[:, 1], lf2[:, 1]
                state = state.replace(
                    dy2_params=unstack2(params2, 0), dy2_opt=unstack2(opt2, 0),
                    ddem_params=unstack2(params2, 1), ddem_opt=unstack2(opt2, 1),
                )
            else:
                (dy2_params, dy2_opt), (y2_real, y2_fake) = jax.lax.scan(
                    crit_seq_body("y2"),
                    (state.dy2_params, state.dy2_opt),
                    (xb, yb, noises_y2, eps_y2, valid),
                )
                (ddem_params, ddem_opt), (dem_real_l, dem_fake_l) = jax.lax.scan(
                    crit_seq_body("dem"),
                    (state.ddem_params, state.ddem_opt),
                    (xb, yb, noises_dem, eps_dem, valid),
                )
                state = state.replace(
                    dy2_params=dy2_params, dy2_opt=dy2_opt,
                    ddem_params=ddem_params, ddem_opt=ddem_opt,
                )

            # ---- generator step on the last consumed batch (reference :873) ----
            last = jnp.argmax(jnp.cumsum(valid.astype(jnp.int32))) # last valid iter
            x = shard_b(xb[last])
            y2 = shard_b(yb[last])
            y1 = x[..., :1]

            crit_y2_fn, _ = make_critic_fns(state.dy2_params)
            crit_dem_fn, _ = make_critic_fns(state.ddem_params)

            probe_noises = shard_b(
                jax.random.normal(
                    k_probe, (cfg.k_noise, B, self.model_cfg.noise_size, 1)
                ),
                1,
            )

            # Best-of-k probe, no update (reference :868-877), one device
            # call. lax.map (not vmap): the k forwards run sequentially on
            # the core either way, but map keeps peak activation memory at
            # one forward instead of k (vmap OOMs at batch 64, k=10).
            def probe(z):
                dem = gen_fwd(x, z)
                loss, _ = generator_loss(
                    cfg, threshold, dem, y1, y2, crit_y2_fn, crit_dem_fn
                )
                return loss

            probe_losses = jax.lax.map(probe, probe_noises)
            best = jnp.argmin(probe_losses)
            z_best = probe_noises[best]

            def g_loss_fn(g_params):
                variables = {"params": g_params, "batch_stats": state.g_stats}
                if batch_bn:
                    dem, ups = gen.apply(
                        variables, x, z_best, train=True,
                        rngs={"dropout": k_drop}, mutable=["batch_stats"],
                    )
                    new_stats = ups["batch_stats"]
                elif use_fused:
                    # Differentiates through the in-jit BN fold + s2d kernel
                    # transforms + fused Pallas kernels (custom VJPs,
                    # ops/conv_s2d_pallas.py) — gradient parity vs the Flax
                    # graph is pinned by tests/test_fused_grad.py.
                    Wg = fused.build_weights(variables)
                    dem = fused.forward(Wg, x, z_best)
                    new_stats = state.g_stats
                else:
                    dem = gen.apply(variables, x, z_best, train=False)
                    new_stats = state.g_stats
                loss, aux = generator_loss(
                    cfg, threshold, dem, y1, y2, crit_y2_fn, crit_dem_fn
                )
                return loss, (aux, new_stats)

            (_, (gen_aux, new_stats)), g_grads = jax.value_and_grad(
                g_loss_fn, has_aux=True
            )(state.g_params)
            g_ups, g_opt = tx_g.update(g_grads, state.g_opt, state.g_params)
            g_params = optax.apply_updates(state.g_params, g_ups)
            state = state.replace(g_params=g_params, g_stats=new_stats, g_opt=g_opt)

            metrics = {
                "crit_y2_real": y2_real,
                "crit_y2_fake": y2_fake,
                "crit_dem_real": dem_real_l,
                "crit_dem_fake": dem_fake_l,
                "gen": gen_aux,
                "best_noise_idx": best,
            }
            return state, metrics

        return superstep

    def _build_val_step(self):
        gen, critic = self.gen, self.critic

        def val_step_fn(state, x_val, y2_val, fixed_noise):
            """Validation critic scores + the generated DEM
            (reference :845-847).

            Note `val_D_real_generated_loss` scores the critic on the RAW
            generator output (the DEM), not the reconstructed follow-up:
            `netD_y2.predict(netG.predict([x_val, fixed_noise]))` at
            reference :847 — faithful even though the Y2 critic was trained
            on follow-up images (y1 + DEM). The DEM is returned so the
            image stream (reference :858-865) reuses this forward instead
            of running a second one; it stays on device unless fetched."""
            y1 = x_val[..., :1]
            d_fake = jnp.mean(critic.apply({"params": state.dy2_params}, y1))
            d_real = jnp.mean(critic.apply({"params": state.dy2_params}, y2_val))
            dem = gen.apply(
                {"params": state.g_params, "batch_stats": state.g_stats},
                x_val, fixed_noise, train=False,
            )
            d_gen = jnp.mean(critic.apply({"params": state.dy2_params}, dem))
            return d_fake, d_real, d_gen, dem

        # The pure fn is kept for the multi-fold trainer, which shard_maps
        # it over the fold axis (train/multi_fold.py).
        self._val_step_fn = val_step_fn
        return jax.jit(val_step_fn)

    # ------------------------------------------------------------------- fit

    def _d_iters_for(self, counters: Counters) -> int:
        return self._d_iters_for_gi(counters.gen_iterations)

    def _d_iters_for_gi(self, gi: int) -> int:
        c = self.cfg
        if gi < c.warmup_until or gi % c.warmup_every == 0:
            return c.warmup_d_iters
        return c.d_iters

    def _chunk_len(self) -> int:
        """Supersteps per device dispatch (steady phase). One superstep
        dispatch costs ~2.6 s of host time on the remote backend —
        marshaling the ~200-leaf donated state dwarfs the 0.6 s of device
        compute (scripts/fold_anchor.py, docs/PERF.md round 3) — so fit_fold
        scans up to this many supersteps inside ONE jitted call. Bounded by
        the validation cadence (the chunk must end exactly where the
        reference validates/checkpoints, so observable behaviour is
        unchanged)."""
        c = self.cfg
        if c.dispatch_chunk > 0:
            return c.dispatch_chunk
        return max(1, min(c.validate_every, c.metric_flush_every))

    def _build_chunk(self, d_iters: int):
        """Scan-of-supersteps: runs L supersteps on device in one dispatch.

        Trajectory-identical to L sequential superstep calls: the RNG key
        is carried and split once per ACTIVE superstep (exactly the host
        loop's split sequence), epoch-tail masking comes in via the
        per-superstep n_valid, and padded (inactive) supersteps advance
        neither the state nor the key."""
        superstep_fn = self._superstep_fns[d_iters]

        def chunk(state, x_all, y_all, idx, nvalid, active, key):
            # idx (L, D, B) int32; nvalid, active (L,).
            def body(carry, xs):
                st, k = carry
                idx_k, nv_k, act_k = xs
                k, sk = jax.lax.cond(
                    act_k,
                    lambda kk: tuple(jax.random.split(kk)),
                    lambda kk: (kk, kk),
                    k,
                )
                valid = (jnp.arange(d_iters) < nv_k) & act_k
                new_st, metrics = superstep_fn(
                    st, x_all, y_all, idx_k, valid, sk
                )
                st = tree_select(act_k, new_st, st)
                return (st, k), pack_superstep_metrics(metrics)

            (state, key), vecs = jax.lax.scan(
                body, (state, key), (idx, nvalid, active)
            )
            return state, key, vecs

        return chunk

    def _chunk_step(self, d: int, length: int):
        # Keyed on (d, L): sizing the scan to the actual span count instead
        # of padding to chunk_len stops the device from executing masked-out
        # supersteps (an epoch tail padded 10 -> 25 wasted 15 full
        # supersteps of compute — round-4 anchor finding). Lengths per run
        # are few (full chunks + one tail per epoch shape), so the compile
        # count stays bounded like UResNetTrainer.chunk_step_fn's.
        fn = self._chunk_jits.get((d, length))
        if fn is None:
            fn = jax.jit(self._build_chunk(d), donate_argnums=0)
            self._chunk_jits[(d, length)] = fn
        return fn

    def superstep(self, state, x_all, y_all, idx_block, n_valid, key):
        """Run one superstep with a (D, B) index block, of which the first
        ``n_valid`` rows are real batches (rest are padding)."""
        d = idx_block.shape[0]
        valid = jnp.arange(d) < n_valid
        idx = jnp.asarray(idx_block)
        if self._data_parallel:
            # Shard the batch axis of the index stack over `data`; the
            # on-device gather then yields data-parallel batch leaves.
            idx = jax.device_put(idx, meshlib.index_sharding(self.mesh, idx.ndim))
        state, metrics = self._steps[d](state, x_all, y_all, idx, valid, key)
        return state, metrics

    def fit_fold(
        self,
        state: GanTrainState,
        counters: Counters,
        x_train: np.ndarray,
        y_train: np.ndarray,
        x_val: np.ndarray,
        y_val: np.ndarray,
        n_epochs: int | None = None,
        logger=None,
        checkpoint_fn=None,
        fold: int = 1,
        seed: int | None = None,
    ) -> tuple[GanTrainState, Counters]:
        cfg = self.cfg
        n_epochs = n_epochs if n_epochs is not None else cfg.n_epochs
        key = jax.random.key(seed if seed is not None else cfg.seed + fold)

        # The fold dataset stays replicated (folds are small — ~4,800 slices,
        # SURVEY §6 — so batch gathers are comm-free); the *batch* leaves are
        # sharded over `data` by superstep's index sharding + the in-jit
        # constrain_batch pins, which is where the data parallelism lives.
        def put(arr):
            return (
                meshlib.put_replicated(jnp.asarray(arr), self.mesh)
                if self.mesh is not None
                else jnp.asarray(arr)
            )

        x_all, y_all = put(x_train), put(y_train)
        xv, yv = put(x_val), put(y_val)
        key, vk = jax.random.split(key)
        fixed_noise = jax.random.normal(
            vk, (x_val.shape[0], self.model_cfg.noise_size, 1)
        )
        shuffler = EpochShuffler(x_train.shape[0], cfg.batch_size, cfg.seed + fold)
        t0 = time.time()
        log = logger.log_scalar if logger is not None else (lambda *a: None)
        timer = StepTimer()
        graph_logged = False

        # Deferred metric fetching: each superstep appends ONE packed device
        # vector (dispatch only — the host never blocks on it); the buffer is
        # drained with a single transfer every metric_flush_every supersteps,
        # before any validation that needs the values, and at the end. The
        # emitted (tag, value, step) streams are byte-identical to eager
        # logging (pinned by tests/test_training.py) — only the fetch
        # schedule changes. Eager fetching measured 2.7 s/superstep of round
        # trips vs 0.6 s device compute (docs/PERF.md round 3).
        # Each entry: (device array of packed rows — (L, len) from a chunk or
        # (len,) from a single superstep — and the per-ACTIVE-row metadata
        # [(d, n_valid, counters), ...]; padded chunk rows carry no meta and
        # are skipped).
        pending: list[tuple] = []
        n_pending = 0  # supersteps buffered
        last_logged: tuple | None = None  # (metrics host dict, gen_aux)

        def flush():
            nonlocal pending, n_pending, last_logged
            if not pending:
                return last_logged
            if len(pending) == 1:
                flat = np.asarray(pending[0][0]).reshape(-1)
            else:
                flat = np.asarray(
                    jnp.concatenate([jnp.reshape(a, (-1,)) for a, _ in pending])
                )
            off = 0
            for arr, metas in pending:
                n_rows = arr.shape[0] if arr.ndim == 2 else 1
                for r, (d_, nv, ctr) in enumerate(metas):
                    ln = 4 * d_ + len(_GEN_KEYS)
                    m = unpack_superstep_metrics(
                        flat[off + r * ln : off + (r + 1) * ln], d_
                    )
                    gen_aux = log_superstep_metrics(log, m, ctr, nv)
                    last_logged = (m, gen_aux)
                off += n_rows * (4 * metas[0][0] + len(_GEN_KEYS))
            pending = []
            n_pending = 0
            return last_logged

        chunk_len = self._chunk_len()
        for epoch in range(n_epochs):
            idx_epoch = shuffler.epoch()
            n_batches = idx_epoch.shape[0]
            i = 0
            while i < n_batches:
                d = self._d_iters_for(counters)

                # ---- plan one device dispatch: a single superstep (warm
                # phase, or chunking off) or up to chunk_len steady
                # supersteps — boundaries are the shared planner's
                # (plan_dispatch_chunk above); the host needs the
                # intermediate state only at those points, so chunking
                # changes no observable behaviour (trajectory identity
                # pinned by tests/test_training.py).
                spans, i = plan_dispatch_chunk(
                    i, n_batches, d, counters.gen_iterations, cfg, chunk_len,
                    self._d_iters_for_gi,
                    checkpoints=checkpoint_fn is not None,
                )
                plan = []  # (index block, n_valid) per superstep
                for start, n_valid in spans:
                    block = np.zeros((d, cfg.batch_size), np.int32)
                    block[:n_valid] = idx_epoch[start : start + n_valid]
                    plan.append((block, n_valid))

                if logger is not None and not graph_logged:
                    # TensorBoard graph tab (reference log_graph :174-175,:510):
                    # the jaxpr of the exact superstep about to run.
                    logger.log_graph(
                        self._superstep_fns[d],
                        (state, x_all, y_all, jnp.asarray(plan[0][0]),
                         jnp.arange(d) < plan[0][1], key),
                    )
                    graph_logged = True

                if len(plan) == 1:
                    key, sk = jax.random.split(key)
                    state, metrics = self.superstep(
                        state, x_all, y_all, plan[0][0], plan[0][1], sk
                    )
                    vec_arr = self._pack_metrics(metrics)
                else:
                    L = len(plan)
                    idx_stack = np.zeros((L, d, cfg.batch_size), np.int32)
                    nvalid = np.zeros((L,), np.int32)
                    active = np.zeros((L,), bool)
                    for j, (blk, nv) in enumerate(plan):
                        idx_stack[j], nvalid[j], active[j] = blk, nv, True
                    idxs = jnp.asarray(idx_stack)
                    if self._data_parallel:
                        idxs = jax.device_put(
                            idxs, meshlib.index_sharding(self.mesh, 3)
                        )
                    state, key, vec_arr = self._chunk_step(d, L)(
                        state, x_all, y_all, idxs,
                        jnp.asarray(nvalid), jnp.asarray(active), key,
                    )

                # --- logging at reference-equivalent resolution (deferred
                # fetch; values/steps identical to eager) ---
                metas = []
                for j, (_, nv) in enumerate(plan):
                    metas.append((d, nv, counters))
                    counters = counters.replace(
                        crit_iterations=counters.crit_iterations + nv,
                        crit_dem_iterations=counters.crit_dem_iterations + nv,
                    )
                    gi = counters.gen_iterations
                    timer.step()
                    if j < len(plan) - 1:
                        counters = counters.replace(gen_iterations=gi + 1)
                pending.append((vec_arr, metas))
                n_pending += len(plan)
                if n_pending >= cfg.metric_flush_every:
                    flush()

                # --- validation (reference :842-855) ---
                if gi % cfg.validate_every == 0:
                    m_last, gen_aux = flush()
                    d_fake, d_real, d_gen, val_dem = self._val_step(
                        state, xv, yv, fixed_noise
                    )
                    # One transfer for the three scores (not three).
                    vals = np.asarray(jnp.stack([d_fake, d_real, d_gen]))
                    log("val_D_fake_loss", float(vals[0]), gi)
                    log("val_D_real_loss", float(vals[1]), gi)
                    log("val_D_real_generated_loss", float(vals[2]), gi)
                    if logger is not None:
                        timer.log_to(logger, gi)
                    err_d = float(
                        m_last["crit_y2_real"][n_valid - 1]
                        - m_last["crit_y2_fake"][n_valid - 1]
                    )
                    print(
                        f"TRN FOLD {fold} [{epoch}/{n_epochs}][{i}/{n_batches}]"
                        f"[{gi}] errD {err_d:+.4f} "
                        f"errG {gen_aux['errG']:+.4f} ({time.time() - t0:.1f}s)"
                    )
                    # Validation images every image_log_every gen iterations
                    # (reference :858-865: generated DEM + fake follow-up,
                    # first n_val_images of the val set — [:50] at ref :862).
                    if logger is not None and gi % cfg.image_log_every == 0:
                        k_img = cfg.n_val_images
                        dem = val_dem  # same forward the val scores used
                        fake = xv[..., :1] + dem
                        logger.log_images(
                            f"attributed_img_step{gi}", np.asarray(dem[:k_img]), gi
                        )
                        logger.log_images(
                            f"fake_img_step{gi}", np.asarray(fake[:k_img]), gi
                        )

                counters = counters.replace(gen_iterations=gi + 1)
                if checkpoint_fn is not None and (gi + 1) % cfg.checkpoint_every == 0:
                    checkpoint_fn(state, counters)

        flush()
        return state, counters
