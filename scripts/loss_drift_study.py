"""Quantify training-objective drift of the jit-ability loss redesigns.

Round-3 VERDICT item 6: LocalSSI and EdgeGuidedLocalSSI were redesigned for
static shapes (log-mean kernel instead of per-step random kernel sizes;
static top-k edge selection instead of data-dependent quantile sampling).
This study runs the EXACT reference formulations
(/root/reference/unidepth/ops/losses/local_ssi.py — imported and executed,
including its pure-torch ``extract_patches`` fallback, local_ssi.py:43-78)
against the JAX redesigns on ~100 synthetic depth batches and measures:

  A. *aligned* drift — reference forced onto the redesign's deterministic
     choices (mean kernel, zero roll; for the edge loss, the redesign's own
     patch coordinates fed into the reference's ``compute_sample_patch_error``)
     so any difference is shared-math error, not design drift.  Expect ~fp32
     rounding.
  B. *design* drift — reference run as trained (random kernel sizes / rolls /
     quantile edge sampling, D draws per batch) vs the deterministic JAX
     value: relative loss-value drift against the draw mean (and where it
     sits inside the draw distribution), plus gradient cosine between the
     JAX gradient and the reference's expected (draw-averaged) gradient.

Writes docs/LOSS_DRIFT.md. Run on any host (forces JAX to CPU):

    python scripts/loss_drift_study.py [--batches 100] [--draws 8] [--size 224]
"""

from __future__ import annotations

import argparse
import importlib.util
import sys
import time
from contextlib import contextmanager
from pathlib import Path

import numpy as np
import torch
import torch.nn.functional as TF

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from unidepth_tpu.training import losses as jl  # noqa: E402


# ---------------------------------------------------------------------------
# Reference import (same stub machinery as tests/test_reference_parity.py)
# ---------------------------------------------------------------------------
def load_reference_losses():
    spec = importlib.util.spec_from_file_location(
        "derive_reference_keys",
        REPO / "tests" / "fixtures" / "derive_reference_keys.py",
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod._install_stubs()
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    import unidepth.ops.losses.local_ssi as ref_ls

    return ref_ls


@contextmanager
def forced_numpy_random(uniform=None, randint=None):
    """Temporarily pin the np.random draws the reference loss makes."""
    saved_u, saved_r = np.random.uniform, np.random.randint
    try:
        if uniform is not None:
            np.random.uniform = uniform
        if randint is not None:
            np.random.randint = randint
        yield
    finally:
        np.random.uniform, np.random.randint = saved_u, saved_r


# ---------------------------------------------------------------------------
# Synthetic depth batches
# ---------------------------------------------------------------------------
def smooth_field(rng, b, h, w, coarse=12):
    x = rng.standard_normal((b, 1, coarse, coarse)).astype(np.float32)
    t = TF.interpolate(
        torch.from_numpy(x), size=(h, w), mode="bilinear", align_corners=False
    )
    return t.numpy()


def make_batch(seed, b, h, w):
    """Depth-like GT/pred + ~80%-valid mask + an RGB image with real step
    edges (so the edge loss has structure to find)."""
    rng = np.random.default_rng(seed)
    log_gt = smooth_field(rng, b, h, w) * 0.8 + np.log(5.0)
    # step discontinuities: a few random rectangles at different depths
    img = smooth_field(rng, b, h, w, coarse=8).repeat(3, axis=1) * 0.2 + 0.5
    for i in range(b):
        for _ in range(4):
            y0, x0 = rng.integers(10, h - 40), rng.integers(10, w - 40)
            dy, dx = rng.integers(20, h // 2), rng.integers(20, w // 2)
            log_gt[i, :, y0 : y0 + dy, x0 : x0 + dx] += rng.uniform(-0.8, 0.8)
            img[i, :, y0 : y0 + dy, x0 : x0 + dx] += rng.uniform(
                -0.4, 0.4, size=(3, 1, 1)
            ).astype(np.float32)
    gt = np.exp(log_gt)
    pred = gt * np.exp(
        smooth_field(rng, b, h, w) * 0.15
        + rng.standard_normal((b, 1, h, w)).astype(np.float32) * 0.03
    )
    mask = (smooth_field(rng, b, h, w, coarse=10) > -0.8).astype(np.float32)
    validity = np.ones((b, 1, h, w), np.float32)
    validity[:, :, :5, :] = 0.0
    validity[:, :, :, :5] = 0.0
    return dict(
        pred=pred.astype(np.float32),
        gt=gt.astype(np.float32),
        mask=mask,
        image=np.clip(img, 0.0, 1.0).astype(np.float32),
        validity=validity,
    )


def to_torch(a, grad=False):
    t = torch.from_numpy(np.ascontiguousarray(a))
    if grad:
        t.requires_grad_(True)
    return t


def chlast(a):  # (B,C,H,W) numpy -> (B,H,W,C) jnp
    return jnp.asarray(np.transpose(a, (0, 2, 3, 1)))


def cosine(a, b):
    a, b = np.asarray(a, np.float64).ravel(), np.asarray(b, np.float64).ravel()
    na, nb = np.linalg.norm(a), np.linalg.norm(b)
    return float(a @ b / max(na * nb, 1e-30)), float(na / max(nb, 1e-30))


def rel(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return float(np.max(np.abs(a - b) / np.maximum(np.abs(b), 1e-12)))


def loo_cosine(grads):
    """Mean cosine between one reference draw's gradient and the mean of the
    others — the reference's OWN draw-to-expected-gradient agreement, the
    yardstick for judging the redesign's cosine."""
    g = np.stack([np.asarray(x, np.float64).ravel() for x in grads])
    total = g.sum(0)
    cs = []
    for i in range(len(g)):
        rest = (total - g[i]) / (len(g) - 1)
        cs.append(g[i] @ rest / max(np.linalg.norm(g[i]) * np.linalg.norm(rest), 1e-30))
    return float(np.mean(cs))


# ---------------------------------------------------------------------------
# LocalSSI
# ---------------------------------------------------------------------------
PATCH_SIZE = (0.0625, 0.5)  # fractional convention (see losses.py:360-364)


def localssi_pair(ref_ls):
    ref = ref_ls.LocalSSI(weight=1.0, patch_size=PATCH_SIZE, num_levels=4)
    ours = jl.LocalSSI(weight=1.0, patch_size=PATCH_SIZE, num_levels=4)
    return ref, ours


def study_localssi(ref_ls, batches, draws, b, h, w):
    ref, ours = localssi_pair(ref_ls)

    jax_val_grad = jax.jit(
        jax.value_and_grad(lambda p, t, m: ours(p, t, m, rng=None).sum())
    )

    @jax.jit
    def jax_draw_val_grad(p, t, m, key):
        """One draw of the randomized redesign (lax.switch kernel buckets +
        random roll): per-sample values and the gradient."""
        vec = ours(p, t, m, rng=key)
        grad = jax.grad(lambda pp: ours(pp, t, m, rng=key).sum())(p)
        return vec, grad

    rows_aligned, rows_design = [], []
    for n in range(batches):
        d = make_batch(1000 + n, b, h, w)
        pj = chlast(d["pred"])
        tj = chlast(d["gt"])
        mj = chlast(d["mask"]) > 0.5
        lj_sum, gj = jax_val_grad(pj, tj, mj)
        lj = np.asarray(ours(pj, tj, mj, rng=None))
        gj = np.transpose(np.asarray(gj), (0, 3, 1, 2))

        # A. aligned: eval-mode kernel (= the redesign's log-mean), zero roll
        ref.train(False)
        pt = to_torch(d["pred"], grad=True)
        with forced_numpy_random(randint=lambda lo, hi: 0):
            lt = ref(pt, to_torch(d["gt"]), to_torch(d["mask"]))
        lt.sum().backward()
        cos, nrm = cosine(gj, pt.grad.numpy())
        rows_aligned.append((rel(lj, lt.detach().numpy()), cos, nrm))

        # B. design: reference as trained (random kernels + rolls), D draws,
        # vs the redesign as trained (D draws of the lax.switch kernel
        # buckets + random roll). Both sides are now draws of a randomized
        # objective, so the comparison is draw-to-expected-gradient on each
        # side: our per-draw cosine against the reference's draw-mean
        # gradient, judged against the reference's own LOO agreement.
        ref.train(True)
        np.random.seed(7000 + n)
        vals, grads = [], []
        for _ in range(draws):
            pt = to_torch(d["pred"], grad=True)
            lt = ref(pt, to_torch(d["gt"]), to_torch(d["mask"]))
            lt.sum().backward()
            vals.append(lt.detach().numpy())
            grads.append(pt.grad.numpy())
        vals = np.stack(vals)  # (D, B)
        gmean = np.mean(grads, axis=0)

        jvals, jcos, jnorms = [], [], []
        for di in range(draws):
            key = jax.random.PRNGKey(9000 + n * 131 + di)
            vec, gd = jax_draw_val_grad(pj, tj, mj, key)
            gd = np.transpose(np.asarray(gd), (0, 3, 1, 2))
            jvals.append(np.asarray(vec))
            c, _ = cosine(gd, gmean)
            jcos.append(c)
            jnorms.append(np.linalg.norm(np.asarray(gd, np.float64)))
        jvals = np.stack(jvals)  # (D, B)
        ref_norms = [np.linalg.norm(np.asarray(g, np.float64)) for g in grads]
        nrm = float(np.mean(jnorms) / max(np.mean(ref_norms), 1e-30))
        z = (jvals.mean(0) - vals.mean(0)) / np.maximum(vals.std(0), 1e-12)
        rows_design.append(
            (
                rel(jvals.mean(0), vals.mean(0)),
                float(np.max(np.abs(z))),
                float(np.mean(jcos)),
                nrm,
                loo_cosine(grads),
            )
        )
    return np.asarray(rows_aligned), np.asarray(rows_design)


# ---------------------------------------------------------------------------
# EdgeGuidedLocalSSI
# ---------------------------------------------------------------------------
def edge_pair(ref_ls):
    ref = ref_ls.EdgeGuidedLocalSSI(
        weight=1.0, input_fn="log1i", min_samples=6, use_global=True
    )
    ours = jl.EdgeGuidedLocalSSI(weight=1.0, input_fn="log1i", min_samples=6)
    return ref, ours


def study_edge(ref_ls, batches, draws, b, h, w):
    ref, ours = edge_pair(ref_ls)

    def ours_sum(p, t, m, img, vm):
        return ours(p, t, m, image=img, validity_mask=vm).sum()

    jax_val_grad = jax.jit(jax.value_and_grad(ours_sum))

    rows_aligned, rows_design = [], []
    for n in range(batches):
        d = make_batch(2000 + n, b, h, w)
        pj = chlast(d["pred"])
        tj = chlast(d["gt"])
        mj = chlast(d["mask"]) > 0.5
        imgj = chlast(d["image"])
        vmj = chlast(d["validity"])
        _, gj = jax_val_grad(pj, tj, mj, imgj, vmj)
        lj = np.asarray(ours(pj, tj, mj, image=imgj, validity_mask=vmj))
        gj = np.transpose(np.asarray(gj), (0, 3, 1, 2))
        coords, ksize = ours.edge_coords(imgj, vmj, (h, w))
        coords_t = to_torch(np.asarray(coords, np.float32))

        # A. aligned: the reference's own patch/global math at the
        # redesign's coordinates and kernel size
        pt = to_torch(d["pred"], grad=True)
        inp = ref.input_fn(pt.float())
        tgt = ref.input_fn(to_torch(d["gt"]).float())
        msk = to_torch(d["mask"]).bool()
        e_patch = ref.compute_sample_patch_error(
            inp, tgt, msk, coords_t, (ksize, ksize), (h, w)
        ).squeeze(-1)
        e_glob = ref.compute_image_error(inp, tgt, msk, (h, w)).squeeze(-1)
        lt = (e_patch + e_glob) / 2.0
        lt.sum().backward()
        cos, nrm = cosine(gj, pt.grad.numpy())
        rows_aligned.append((rel(lj, lt.detach().numpy()), cos, nrm))

        # B. design: full reference pipeline (quantile edge sampling +
        # random kernel draw) vs the deterministic redesign
        ref.train(True)
        np.random.seed(8000 + n)
        torch.manual_seed(8000 + n)
        vals, grads = [], []
        for _ in range(draws):
            pt = to_torch(d["pred"], grad=True)
            lt = ref(
                pt,
                to_torch(d["gt"]),
                to_torch(d["mask"]),
                image=to_torch(d["image"]),
                validity_mask=to_torch(d["validity"]),
            )
            lt.sum().backward()
            vals.append(lt.detach().numpy())
            grads.append(pt.grad.numpy())
        vals = np.stack(vals)
        gmean = np.mean(grads, axis=0)
        cos, nrm = cosine(gj, gmean)
        z = (lj - vals.mean(0)) / np.maximum(vals.std(0), 1e-12)
        rows_design.append(
            (rel(lj, vals.mean(0)), float(np.max(np.abs(z))), cos, nrm, loo_cosine(grads))
        )
    return np.asarray(rows_aligned), np.asarray(rows_design)


# ---------------------------------------------------------------------------
# Reporting
# ---------------------------------------------------------------------------
def fmt_aligned(rows):
    return (
        f"max rel loss err {rows[:, 0].max():.2e} · "
        f"grad cosine min {rows[:, 1].min():.6f} · "
        f"grad-norm ratio {rows[:, 2].mean():.4f}±{rows[:, 2].std():.4f}"
    )


def fmt_design(rows):
    return (
        f"mean |rel loss drift| {np.mean(rows[:, 0]):.3f} (max {rows[:, 0].max():.3f}) · "
        f"|z| vs draw spread {np.mean(rows[:, 1]):.2f} (max {rows[:, 1].max():.2f}) · "
        f"grad cosine {np.mean(rows[:, 2]):.4f} (min {rows[:, 2].min():.4f}) · "
        f"ref draw LOO cosine {np.mean(rows[:, 4]):.4f} · "
        f"grad-norm ratio {np.mean(rows[:, 3]):.3f}"
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, default=100)
    ap.add_argument("--draws", type=int, default=8)
    ap.add_argument("--size", type=int, default=224)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--update-doc", action="store_true")
    args = ap.parse_args()

    ref_ls = load_reference_losses()
    h = w = args.size
    t0 = time.time()
    ls_a, ls_d = study_localssi(
        ref_ls, args.batches, args.draws, args.batch, h, w
    )
    print(f"LocalSSI done in {time.time() - t0:.0f}s")
    print("  aligned:", fmt_aligned(ls_a))
    print("  design: ", fmt_design(ls_d))
    t0 = time.time()
    eg_a, eg_d = study_edge(ref_ls, args.batches, args.draws, args.batch, h, w)
    print(f"EdgeGuidedLocalSSI done in {time.time() - t0:.0f}s")
    print("  aligned:", fmt_aligned(eg_a))
    print("  design: ", fmt_design(eg_d))

    if args.update_doc:
        doc = REPO / "docs" / "LOSS_DRIFT.md"
        doc.write_text(
            f"""# Training-objective drift of the jit-ability loss redesigns

Produced by `python scripts/loss_drift_study.py --update-doc --batches
{args.batches} --draws {args.draws} --size {args.size}` — the EXACT
reference formulations (/root/reference/unidepth/ops/losses/local_ssi.py,
executed directly with dep stubs, including the pure-torch
`extract_patches` fallback) vs the JAX redesigns in
`unidepth_tpu/training/losses.py`, on {args.batches} synthetic depth
batches (B={args.batch}, {h}x{w}, smooth log-depth + step discontinuities,
~80% valid masks).

Two questions, two measurements:

**A. aligned** — is the shared math (unfold/patch gather, 95%-CI ssi
normalization, masked means, output transforms) identical? The reference is
pinned to the redesign's deterministic choices (eval-mode mean kernel, zero
roll; for the edge loss the redesign's own top-k coordinates and kernel fed
into the reference's `compute_sample_patch_error`/`compute_image_error`).
Differences here would be implementation errors.

**B. design** — how far does the redesign sit from the reference objective
*as trained* (random kernel sizes and rolls; quantile edge sampling with
data-dependent patch counts)? Since r5 the LocalSSI redesign is itself
randomized at train time (the log-uniform kernel draw quantized to
`kernel_buckets` static sizes under `lax.switch` + the traced random
roll), so its row compares {args.draws} redesign draws against
{args.draws} reference draws per batch: relative drift of the draw-mean
loss, where the redesign's draw-mean sits inside the reference draw
distribution (|z| in units of the draw std), and the per-draw cosine
between a redesign draw's gradient and the reference's draw-averaged
(expected) gradient — the quantity SGD actually follows. The
EdgeGuided redesign stays deterministic and is compared as before. The
yardstick for the cosine is the **reference's own leave-one-out draw
agreement** (cosine between one draw's gradient and the mean of the
others): if the redesign's cosine is at or above it, the redesign follows
the expected gradient at least as faithfully as one step of the
reference's own randomized objective does, and the drift is
statistically negligible.

| loss | mode | rel loss err | grad cosine | ref draw LOO cosine (yardstick) | grad-norm ratio |
|---|---|---|---|---|---|
| LocalSSI | A aligned | max {ls_a[:, 0].max():.2e} | min {ls_a[:, 1].min():.6f} | — | {ls_a[:, 2].mean():.4f} |
| LocalSSI | B design (vs {args.draws}-draw mean) | mean {np.mean(ls_d[:, 0]):.3f} / max {ls_d[:, 0].max():.3f} | mean {np.mean(ls_d[:, 2]):.4f} / min {ls_d[:, 2].min():.4f} | {np.mean(ls_d[:, 4]):.4f} | {np.mean(ls_d[:, 3]):.3f} |
| EdgeGuidedLocalSSI | A aligned | max {eg_a[:, 0].max():.2e} | min {eg_a[:, 1].min():.6f} | — | {eg_a[:, 2].mean():.4f} |
| EdgeGuidedLocalSSI | B design (vs {args.draws}-draw mean) | mean {np.mean(eg_d[:, 0]):.3f} / max {eg_d[:, 0].max():.3f} | mean {np.mean(eg_d[:, 2]):.4f} / min {eg_d[:, 2].min():.4f} | {np.mean(eg_d[:, 4]):.4f} | {np.mean(eg_d[:, 3]):.3f} |

Draw-distribution placement (B): the redesign's loss value (draw-mean for
LocalSSI, deterministic for EdgeGuided) sits
|z| = {np.mean(ls_d[:, 1]):.2f} (LocalSSI) / {np.mean(eg_d[:, 1]):.2f}
(EdgeGuided) draw-stds from the reference draw mean on average — the
value is statistically indistinguishable from one more draw
of the reference's own randomization when |z| is O(1).

Two fidelity fixes this study forced (both r4):
- the edge loss's patch term now uses the ssi **stable mask** for its error
  mean and min-samples count (reference local_ssi.py:289-293 reassigns
  `mask` to the ssi output; LocalSSI's patch term does NOT — both matched);
- edge patches are **corner-anchored** like the reference
  (local_ssi.py:38), and the patch count defaults to the reference's 10%
  selection rate. Before these, the gradient cosine was 0.16 (disjoint
  patch pixels); after, it exceeds the LOO yardstick. The (arguably more
  correct) cell-centered variant is kept behind `center_patches=True`.

LocalSSI study config: fractional patch_size {PATCH_SIZE}, 4 levels (no
shipped config uses LocalSSI — the reference's own pixel default (32, 32)
degenerates under its kernel formula, local_ssi.py:132 — so the study uses
the fractional convention the formula implies).
EdgeGuided study config: the shipped one (log1i, min_samples 6, global on).

Guarded by `tests/test_loss_drift.py` (slow tier) at reduced batch count.
"""
        )
        print(f"wrote {doc}")


if __name__ == "__main__":
    main()
