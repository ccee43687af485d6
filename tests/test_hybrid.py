"""Hybrid (object-centric keyframed) formulation tests — RA-L 2025 parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dynosam_tpu.backend import graph, hybrid, window
from dynosam_tpu.backend.backend import RegularBackend
from dynosam_tpu.config import BackendParams, NoiseParams
from dynosam_tpu.dataproviders.simulator import Scenario, ScenarioSpec
from dynosam_tpu.utils import lie

pytestmark = pytest.mark.slow  # heavy jit-compile e2e tier

MAX_OBJ = 4


def hyb_cfg(**kw):
    base = dict(
        max_frames=8,
        max_objects=MAX_OBJ,
        max_static_landmarks=256,
        max_dynamic_landmarks=96,
        backend_updater_enum=3,
    )
    base.update(kw)
    # simulator noise is range-independent; test the pure solver math
    base.setdefault("noise", NoiseParams(use_range_dependent_noise=False))
    return BackendParams(**base)


@pytest.fixture(scope="module")
def clean_scn():
    return Scenario(ScenarioSpec.default_two_objects(num_frames=8))


@pytest.fixture(scope="module")
def noisy_scn():
    return Scenario(
        ScenarioSpec.default_two_objects(
            num_frames=12, pixel_noise=0.4, depth_noise=0.02, seed=5
        )
    )


def ingest_all(scn, cfg, n=None):
    st = graph.empty_graph(cfg)
    for k in range(n or scn.spec.num_frames):
        st = graph.update_from_packet_hybrid(
            st, scn.measurements(k, MAX_OBJ), scn.intr, cfg
        )
    return st


def f2f_errors(st, scn, frames):
    """F2F motion errors vs GT, over frames where the motion is estimable."""
    errs = []
    for f in frames:
        H_f2f = hybrid.f2f_motion(st, f)
        for j in range(2):
            if bool(st.H_valid[j, f]):
                e = lie.local_coordinates(H_f2f[j], scn.H_gt[j][f])
                errs.append(float(jnp.linalg.norm(e)))
    return errs


class TestSmoothingJacobians:
    def test_triple_factor_vs_autodiff(self):
        key = jax.random.PRNGKey(3)
        xi = jax.random.normal(key, (3, 6)) * 0.3
        A, B, C = lie.se3_exp(xi[0]), lie.se3_exp(xi[1]), lie.se3_exp(xi[2])

        def resid(a, b, c):
            Binv = lie.inverse(b)
            return lie.se3_log(lie.mm(lie.mm(lie.mm(a, Binv), c), Binv))

        r = resid(A, B, C)
        Jl_inv = lie.se3_left_jacobian_inv(r)
        Jr_inv = lie.se3_left_jacobian_inv(-r)
        J_A = lie.mm(Jl_inv, lie.adjoint(A))
        J_C = lie.mm(Jr_inv, lie.adjoint(B))
        J_B = -(J_A + J_C)

        z6 = jnp.zeros(6)
        J_A_ad = jax.jacfwd(lambda x: resid(lie.retract(A, x), B, C))(z6)
        J_B_ad = jax.jacfwd(lambda x: resid(A, lie.retract(B, x), C))(z6)
        J_C_ad = jax.jacfwd(lambda x: resid(A, B, lie.retract(C, x)))(z6)
        np.testing.assert_allclose(J_A, J_A_ad, atol=2e-3)
        np.testing.assert_allclose(J_B, J_B_ad, atol=2e-3)
        np.testing.assert_allclose(J_C, J_C_ad, atol=2e-3)


class TestHybridBatch:
    def test_ingestion_structure(self, clean_scn):
        cfg = hyb_cfg()
        st = ingest_all(clean_scn, cfg)
        assert bool(st.kf_valid[0]) and bool(st.kf_valid[1])
        # simulator packets mark object motions valid from frame 1, so the
        # object slots are allocated (and keyframed) at slot 1
        assert int(st.kf_slot[0]) == 1
        # H at keyframe slot is not a variable
        assert not bool(st.H_valid[0, 1])
        assert bool(st.H_valid[0, 3])

    def test_exact_recovery(self, clean_scn):
        # smoothing off: the constant-motion prior is a (deliberate) bias —
        # world-frame F2F motions of a body-constant motion are not constant
        cfg = hyb_cfg(use_smoothing_factor=False)
        st = ingest_all(clean_scn, cfg)
        st = hybrid.optimize(st, cfg)
        for k in range(8):
            err = lie.local_coordinates(st.X[k], clean_scn.X_gt[k])
            assert float(jnp.linalg.norm(err)) < 1e-3, k
        errs = f2f_errors(st, clean_scn, range(1, 8))
        assert max(errs) < 2e-3, errs

    def test_exact_recovery_with_smoothing(self, clean_scn):
        cfg = hyb_cfg()
        st = ingest_all(clean_scn, cfg)
        st = hybrid.optimize(st, cfg)
        for k in range(8):
            err = lie.local_coordinates(st.X[k], clean_scn.X_gt[k])
            assert float(jnp.linalg.norm(err)) < 8e-3, k
        errs = f2f_errors(st, clean_scn, range(1, 8))
        assert max(errs) < 5e-3, errs

    def test_error_decreases(self, noisy_scn):
        cfg = hyb_cfg()
        st = ingest_all(noisy_scn, cfg, n=8)
        e0 = float(hybrid.total_error(st, cfg))
        st = hybrid.optimize(st, cfg)
        e1 = float(hybrid.total_error(st, cfg))
        assert e1 < 0.2 * e0

    def test_noisy_accuracy(self, noisy_scn):
        cfg = hyb_cfg()
        st = ingest_all(noisy_scn, cfg, n=8)
        st = hybrid.optimize(st, cfg)
        for k in range(8):
            err = lie.local_coordinates(st.X[k], noisy_scn.X_gt[k])
            assert float(jnp.linalg.norm(err)) < 0.03, k
        errs = f2f_errors(st, noisy_scn, range(2, 8))
        assert max(errs) < 0.15

    def test_object_pose_accuracy(self, clean_scn):
        cfg = hyb_cfg()
        st = ingest_all(clean_scn, cfg)
        st = hybrid.optimize(st, cfg)
        # L_k = H_{e,k} L_e should track the GT centroid trajectory
        L = hybrid.object_pose(st, 5)
        for j in range(2):
            c_est = np.asarray(L[j][:3, 3])
            c_gt = np.asarray(clean_scn.object_points_world[j][5].mean(axis=0))
            # L translation is the frame-0 centroid transported by GT motion
            c0 = np.asarray(clean_scn.object_points_world[j][0].mean(axis=0))
            H_prod = lie.identity()
            for k in range(1, 6):
                H_prod = lie.compose(clean_scn.H_gt[j][k], H_prod)
            expected = np.asarray(lie.transform_points(H_prod, jnp.asarray(c0)))
            np.testing.assert_allclose(c_est, expected, atol=2e-2)


class TestHybridStreaming:
    def test_streaming(self, noisy_scn):
        cfg = hyb_cfg(max_frames=8, optimization_mode=1)
        be = RegularBackend(cfg, noisy_scn.intr)
        for k in range(12):
            out = be.step(noisy_scn.measurements(k, MAX_OBJ))
        err = lie.local_coordinates(
            jnp.asarray(out.X_world_cam), noisy_scn.X_gt[11]
        )
        assert float(jnp.linalg.norm(err)) < 0.08
        for j, oid in enumerate(noisy_scn.object_ids):
            slot = list(out.object_ids).index(oid)
            assert out.object_motion_valid[slot]
            e = lie.local_coordinates(
                jnp.asarray(out.object_motions[slot]), noisy_scn.H_gt[j][11]
            )
            assert float(jnp.linalg.norm(e)) < 0.25

    def test_incremental(self, noisy_scn):
        cfg = hyb_cfg(max_frames=8, optimization_mode=2)
        be = RegularBackend(cfg, noisy_scn.intr)
        for k in range(12):
            out = be.step(noisy_scn.measurements(k, MAX_OBJ))
        assert np.isfinite(out.X_world_cam).all()
        err = lie.local_coordinates(
            jnp.asarray(out.X_world_cam), noisy_scn.X_gt[11]
        )
        assert float(jnp.linalg.norm(err)) < 0.1

    @staticmethod
    def _perturbed_packets(scn, n, rot=0.01, trans=0.05, seed=11):
        """Simulator packets with PERTURBED initial values. The simulator
        feeds exact-GT poses/motions as inits, so a backend that silently
        freezes (e.g. round 2's NaN marginal prior rejecting every LM step)
        would score a flattering 0.0 error; perturbing the inits makes the
        metric measure what the solver actually estimates."""
        rng = np.random.default_rng(seed)

        def pert(T):
            xi = jnp.asarray(
                np.concatenate([rng.normal(0, rot, 3), rng.normal(0, trans, 3)])
            )
            return lie.retract(jnp.asarray(T), xi)

        out = []
        for k in range(n):
            pk = scn.measurements(k, MAX_OBJ)
            om = jnp.stack(
                [pert(pk.object_motions[j]) for j in range(MAX_OBJ)]
            )
            if k > 0:
                pk = pk.replace(
                    X_world_cam=pert(pk.X_world_cam),
                    odom_prev_curr=pert(pk.odom_prev_curr),
                )
            out.append(pk.replace(object_motions=om))
        return out

    def _mature_ame(self, scn, packets, mode, n):
        cfg = hyb_cfg(
            max_frames=n if mode == 0 else 8, optimization_mode=mode
        )
        be = RegularBackend(cfg, scn.intr)
        for pk in packets:
            be.step(pk)
        if mode == 0:
            be.finish()
        be.finalize_matured()
        te, re_ = [], []
        for k in range(1, n):
            for j, oid in enumerate(scn.object_ids):
                H = be.motion_at(k, object_id=oid)
                if H is None:
                    continue
                e = lie.local_coordinates(jnp.asarray(H), scn.H_gt[j][k])
                e = np.asarray(e)
                re_.append(np.linalg.norm(e[:3]))
                te.append(np.linalg.norm(e[3:]))
        assert len(te) >= 2 * (n - 2) - 4, f"too few mature motions ({len(te)})"
        return (
            float(np.sqrt(np.mean(np.square(te)))),
            float(np.sqrt(np.mean(np.square(re_)))),
        )

    def test_streamed_within_3x_of_batch(self, noisy_scn):
        """Regression pin for the round-3 streaming fix: hybrid sliding and
        incremental mature (marginalization-time) object-motion accuracy
        must stay within 3x of full batch — the reference's iSAM2 parity
        deliverable (near-batch accuracy online). Measured 1.2x at the fix;
        3x leaves headroom for noise while catching any frozen/NaN collapse
        (which scores >5x under perturbed inits)."""
        n = 12
        packets = self._perturbed_packets(noisy_scn, n)
        t_b, r_b = self._mature_ame(noisy_scn, packets, 0, n)
        for mode in (1, 2):
            t_s, r_s = self._mature_ame(noisy_scn, packets, mode, n)
            assert t_s < 3.0 * t_b + 0.005, (mode, t_s, t_b)
            assert r_s < 3.0 * r_b + 0.002, (mode, r_s, r_b)

    def test_batch_not_worse_than_sliding(self, noisy_scn):
        """Regression pin for the round-4 warm-batch fix (VERDICT r3 weak
        #2): full batch must not lose to its own sliding-window mode on
        translation AME. Cold-init batch did (60-frame fixture: 3.45 vs
        1.23 cm, scripts/probe_batch_warm.py); with batch_warm_start the
        batch solve is the upper bound it is supposed to be (0.89 cm)."""
        n = 12
        packets = self._perturbed_packets(noisy_scn, n)
        t_b, _ = self._mature_ame(noisy_scn, packets, 0, n)
        t_s, _ = self._mature_ame(noisy_scn, packets, 1, n)
        assert t_b < 1.15 * t_s + 0.002, (t_b, t_s)


class TestDecoupledAndCovariance:
    """ParallelHybrid solve order + gtsam::Marginals role."""

    def test_decoupled_converges_near_joint(self, noisy_scn):
        scn = noisy_scn
        joint = RegularBackend(hyb_cfg(optimization_mode=0, max_frames=12),
                               scn.intr)
        dec = RegularBackend(
            hyb_cfg(optimization_mode=0, max_frames=12,
                    decoupled_object_solve=True),
            scn.intr,
        )
        for k in range(scn.spec.num_frames):
            pkt = scn.measurements(k, MAX_OBJ)
            joint.step(pkt)
            dec.step(pkt)
        joint.finish()
        dec.finish()

        def errs(be):
            out = []
            for f in range(2, scn.spec.num_frames):
                for j in range(2):
                    H = be.motion_at(f, object_id=scn.object_ids[j])
                    if H is None:
                        continue
                    e = lie.local_coordinates(
                        jnp.asarray(H), scn.H_gt[j][f]
                    )
                    out.append(float(jnp.linalg.norm(e)))
            return float(np.mean(out))

        e_joint, e_dec = errs(joint), errs(dec)
        # decoupling trades a little accuracy for robustness; it must still
        # land in the same regime as the joint solve
        assert e_dec < 3.0 * e_joint + 1e-3
        assert np.isfinite(e_dec)

    def test_marginal_covariances(self, noisy_scn):
        scn = noisy_scn
        be = RegularBackend(hyb_cfg(optimization_mode=0, max_frames=12),
                            scn.intr)
        for k in range(scn.spec.num_frames):
            be.step(scn.measurements(k, MAX_OBJ))
        be.finish()
        cov_X, cov_H = be.marginal_covariances()
        F = be.state.F
        assert cov_X.shape == (F, 6, 6)
        assert cov_H.shape == (be.state.J, F, 6, 6)
        # covariances are symmetric PSD with sane magnitudes on the frames
        # that hold estimated variables
        n = int(be.state.num_frames)
        for f in range(n):
            C = cov_X[f]
            np.testing.assert_allclose(C, C.T, atol=1e-6)
            ev = np.linalg.eigvalsh(C)
            assert ev.min() > -1e-7
            assert ev.max() < 1.0
        # the gauge-anchored first pose is the most certain
        assert np.trace(cov_X[0]) <= np.trace(cov_X[n - 1]) + 1e-6

    def test_wcme_covariance_raises(self, noisy_scn):
        be = RegularBackend(
            BackendParams(max_frames=8, max_objects=MAX_OBJ,
                          max_static_landmarks=256, max_dynamic_landmarks=96,
                          backend_updater_enum=0),
            noisy_scn.intr,
        )
        with pytest.raises(NotImplementedError):
            be.marginal_covariances()

    def test_enum2_is_hybrid(self):
        be = RegularBackend(hyb_cfg(backend_updater_enum=2),
                            Scenario(ScenarioSpec.default_two_objects(
                                num_frames=4)).intr)
        assert be.hybrid


class TestLargeObjectCapacity:
    """De-looped assembly: J=16 slots compile and solve (compile time is
    J-independent — constant one-hot contractions, no Python J-loops; see
    STATUS.md compile-time table)."""

    def test_j16_ingest_optimize_advance(self, noisy_scn):
        cfg = hyb_cfg(max_objects=16, max_frames=8)
        st = graph.empty_graph(cfg)
        scn = noisy_scn
        for k in range(8):
            st = graph.update_from_packet_hybrid(
                st, scn.measurements(k, 16), scn.intr, cfg
            )
        st = hybrid.optimize(st, cfg)
        errs = f2f_errors(st, scn, [3, 5, 7])
        assert errs and float(np.mean(errs)) < 0.05
        st2 = window.advance_hybrid(st, cfg)
        assert bool(jnp.isfinite(st2.X).all())
        assert bool(jnp.isfinite(st2.prior_L).all())
