"""Golden parity tests against torch for optimizer/scheduler/loss semantics.

These pin the exact behaviors the reference relies on: torch Adam with
L2-into-gradient weight decay, ReduceLROnPlateau's threshold/patience state
machine, and the GMoF robustifier — compared op-for-op against our
implementations on identical inputs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")


class TestAdamParity:
    def test_adam_with_l2_matches_torch(self, rng):
        """optax chain(add_decayed_weights, scale_by_adam, scale) must track
        torch.optim.Adam(weight_decay=wd) step-for-step."""
        import optax
        w0 = rng.randn(7, 5).astype(np.float32)
        grads = [rng.randn(7, 5).astype(np.float32) for _ in range(12)]
        lr, wd = 1e-2, 1e-3

        tw = torch.nn.Parameter(torch.tensor(w0.copy()))
        topt = torch.optim.Adam([tw], lr=lr, weight_decay=wd)
        for g in grads:
            topt.zero_grad()
            tw.grad = torch.tensor(g)
            topt.step()

        opt = optax.chain(optax.add_decayed_weights(wd),
                          optax.scale_by_adam(), optax.scale(-lr))
        jw = jnp.asarray(w0)
        state = opt.init(jw)
        for g in grads:
            u, state = opt.update(jnp.asarray(g), state, jw)
            jw = jw + u
        np.testing.assert_allclose(np.asarray(jw), tw.detach().numpy(),
                                   atol=2e-6)

    def test_adamw_matches_torch(self, rng):
        import optax
        w0 = rng.randn(4, 3).astype(np.float32)
        grads = [rng.randn(4, 3).astype(np.float32) for _ in range(8)]
        lr, wd = 1e-2, 1e-2

        tw = torch.nn.Parameter(torch.tensor(w0.copy()))
        topt = torch.optim.AdamW([tw], lr=lr, weight_decay=wd)
        for g in grads:
            topt.zero_grad()
            tw.grad = torch.tensor(g)
            topt.step()

        # torch AdamW: p -= lr*wd*p BEFORE the adam step each iteration ==
        # decoupled decay folded into the same update.
        opt = optax.chain(optax.scale_by_adam(),
                          optax.add_decayed_weights(wd), optax.scale(-lr))
        jw = jnp.asarray(w0)
        state = opt.init(jw)
        for g in grads:
            u, state = opt.update(jnp.asarray(g), state, jw)
            jw = jw + u
        np.testing.assert_allclose(np.asarray(jw), tw.detach().numpy(),
                                   atol=2e-5)


class TestPlateauParity:
    def test_matches_torch_reduce_on_plateau(self, rng):
        """Feed an adversarial loss sequence to both state machines; the
        effective lr must match at every step (factor 0.5, min_lr 1e-6 —
        the reference's settings)."""
        from nemo_tpu.fit import plateau_init, plateau_update
        base_lr, factor = 0.1, 0.5
        losses = np.concatenate([
            np.linspace(1.0, 0.5, 5),         # improving
            np.full(15, 0.5),                  # plateau -> one decay
            [0.4],                             # improvement resets
            np.full(30, 0.4),                  # long plateau -> more decays
            rng.uniform(0.39, 0.41, 20),       # noisy plateau
        ]).astype(np.float32)

        p = torch.nn.Parameter(torch.zeros(1))
        topt = torch.optim.SGD([p], lr=base_lr)
        tsch = torch.optim.lr_scheduler.ReduceLROnPlateau(
            topt, factor=factor, min_lr=1e-6)

        s = plateau_init()
        for i, loss in enumerate(losses):
            tsch.step(float(loss))
            s = plateau_update(s, jnp.asarray(loss), factor, base_lr)
            torch_lr = topt.param_groups[0]["lr"]
            ours = base_lr * float(s.scale)
            assert ours == pytest.approx(torch_lr, rel=1e-6), \
                f"step {i}: ours {ours} vs torch {torch_lr}"


class TestGMoFParity:
    def test_matches_torch_reference_formula(self, rng):
        from nemo_tpu.priors import gmof
        r = rng.randn(16, 25, 2).astype(np.float32) * 50
        rt = torch.tensor(r)
        rho = 100.0
        sq = rt ** 2
        want = (rho ** 2 * sq / (sq + rho ** 2)).numpy()
        got = np.asarray(gmof(jnp.asarray(r), rho=rho))
        np.testing.assert_allclose(got, want, rtol=1e-6)

    def test_mse_robust_keypoint_loss_matches_torch(self, rng):
        """The default fit loss ('mse_robust'): conf-gated GMoF."""
        from nemo_tpu.fit import keypoint_loss
        pred = rng.randn(8, 25, 2).astype(np.float32) * 30
        gt = rng.randn(8, 25, 2).astype(np.float32) * 30
        conf = rng.rand(8, 25, 1).astype(np.float32)

        pt, gtt, ct = map(torch.tensor, (pred, gt, conf))
        res = pt - gtt
        sq = res ** 2
        rho = 100.0
        want = ((ct > 0.5).float() * (rho ** 2 * sq / (sq + rho ** 2))).numpy()
        got = np.asarray(keypoint_loss(jnp.asarray(pred), jnp.asarray(gt),
                                       jnp.asarray(conf),
                                       loss_type="mse_robust"))
        np.testing.assert_allclose(got, want, rtol=1e-5)
