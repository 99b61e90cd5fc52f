"""Literal numpy transcription of the reference update equations
(/root/reference/alpine/main.py:474-753), used as the math oracle for parity
tests (SURVEY.md §4.1).  Operates on per-block lists exactly like the
reference; float64 throughout so the oracle is the precision anchor."""

from __future__ import annotations

import numpy as np


def _cat_w(Ws):
    return np.concatenate(Ws, axis=1)


def _cat_h(Hs):
    return np.concatenate(Hs, axis=0)


def _split_w(W, blocks):
    out, o = [], 0
    for k in blocks:
        out.append(W[:, o:o + k].copy())
        o += k
    return out


def _split_h(H, blocks):
    out, o = [], 0
    for k in blocks:
        out.append(H[o:o + k].copy())
        o += k
    return out


def _orth_mat(size, orth_w):
    # main.py:474-484
    return orth_w * (np.ones((size, size)) - np.eye(size))


def oracle_joint_step(Ws, Hs, Bs, X_b, Ys_b, lam, orth_w, alpha_w, l1, eps, loss_kl):
    """Joint MU step on one batch (main.py:589-663).  Ws/Hs/Bs are per-block
    lists; Hs here are the BATCH slices.  Returns updated (Ws, Hs_batch, Bs)."""
    Ws = [w.astype(np.float64).copy() for w in Ws]
    Hs = [h.astype(np.float64).copy() for h in Hs]
    Bs = [b.astype(np.float64).copy() for b in Bs]
    X_b = X_b.astype(np.float64)
    Ys_b = [y.astype(np.float64) for y in Ys_b]
    blocks = [w.shape[1] for w in Ws]
    n_cov = len(Bs)

    # W update (main.py:592-612)
    W_cat = _cat_w(Ws)
    H_cat = _cat_h(Hs)
    num = 2 * X_b @ H_cat.T
    den = (
        2 * W_cat @ H_cat @ H_cat.T
        + (1 - l1) * alpha_w * W_cat
        + W_cat @ _orth_mat(W_cat.shape[1], orth_w)
    )
    den = den + l1 * alpha_w * np.ones_like(den)
    den = np.maximum(den, eps)
    W_cat = W_cat * num / den
    Ws = _split_w(W_cat, blocks)

    # B updates (main.py:614-628)
    for i in range(n_cov):
        Yb, Hb, B = Ys_b[i], Hs[i], Bs[i]
        if loss_kl:
            num = lam[i] * (Yb / np.maximum(B @ Hb, eps)) @ Hb.T
            den = lam[i] * np.ones_like(Yb) @ Hb.T
        else:
            num = 2 * Yb @ Hb.T
            den = 2 * B @ Hb @ Hb.T
        Bs[i] = B * num / np.maximum(den, eps)

    # H update (main.py:630-663)
    W_cat = _cat_w(Ws)
    H_cat = _cat_h(Hs)
    num = np.zeros_like(H_cat)
    den = np.zeros_like(H_cat)
    start = 0
    for i in range(n_cov):
        end = start + Hs[i].shape[0]
        if loss_kl:
            num[start:end] = lam[i] * Bs[i].T @ (
                Ys_b[i] / np.maximum(Bs[i] @ Hs[i], eps)
            )
            den[start:end] = lam[i] * Bs[i].T @ np.ones_like(Ys_b[i])
        else:
            num[start:end] = 2 * lam[i] * Bs[i].T @ Ys_b[i]
            den[start:end] = 2 * lam[i] * Bs[i].T @ (Bs[i] @ Hs[i])
        start = end
    num += 2 * W_cat.T @ X_b
    den += 2 * W_cat.T @ (W_cat @ H_cat)
    H_cat = H_cat * num / np.maximum(den, eps)
    Hs = _split_h(H_cat, blocks)

    return Ws, Hs, Bs


def oracle_als_step(Ws, Hs, Bs, X_b, Ys_b, lam, orth_w, alpha_w, l1, eps, loss_kl):
    """Block-cyclic (ALS) MU step on one batch (main.py:523-588)."""
    Ws = [w.astype(np.float64).copy() for w in Ws]
    Hs = [h.astype(np.float64).copy() for h in Hs]
    Bs = [b.astype(np.float64).copy() for b in Bs]
    X_b = X_b.astype(np.float64)
    Ys_b = [y.astype(np.float64) for y in Ys_b]
    n_cov = len(Bs)

    for idx in range(len(Ws)):
        # W[idx] (main.py:527-545)
        H_b = Hs[idx]
        W = Ws[idx]
        W_cat = _cat_w(Ws)
        H_cat = _cat_h(Hs)
        num = 2 * X_b @ H_b.T
        den = (
            2 * W_cat @ H_cat @ H_b.T
            + (1 - l1) * alpha_w * W @ np.eye(W.shape[1])
            + W @ _orth_mat(W.shape[1], orth_w)
        )
        den = den + l1 * alpha_w * np.ones_like(den)
        Ws[idx] = W * num / np.maximum(den, eps)

        # B[idx] (main.py:547-562)
        if idx < n_cov:
            Yb, B = Ys_b[idx], Bs[idx]
            if loss_kl:
                num = lam[idx] * (Yb / np.maximum(B @ H_b, eps)) @ H_b.T
                den = lam[idx] * np.ones_like(Yb) @ H_b.T
            else:
                num = 2 * Yb @ H_b.T
                den = 2 * B @ H_b @ H_b.T
            Bs[idx] = B * num / np.maximum(den, eps)

        # H[idx] (main.py:564-588)
        W = Ws[idx]
        W_cat = _cat_w(Ws)
        H_cat = _cat_h(Hs)
        unum = 2 * W.T @ X_b
        uden = 2 * W.T @ (W_cat @ H_cat)
        if idx < n_cov:
            Yb, B = Ys_b[idx], Bs[idx]
            if loss_kl:
                gnum = lam[idx] * B.T @ (Yb / np.maximum(B @ H_b, eps))
                gden = lam[idx] * B.T @ np.ones_like(Yb)
            else:
                gnum = 2 * lam[idx] * B.T @ Yb
                gden = 2 * lam[idx] * B.T @ (B @ H_b)
            Hs[idx] = H_b * (unum + gnum) / np.maximum(uden + gden, eps)
        else:
            Hs[idx] = H_b * unum / np.maximum(uden, eps)

    return Ws, Hs, Bs


def oracle_loss(Ws, Hs, Bs, X, Ys, lam, eps, loss_kl):
    """Full-matrix loss [total, recon, pred...] (main.py:726-753)."""
    W = _cat_w([w.astype(np.float64) for w in Ws])
    H = _cat_h([h.astype(np.float64) for h in Hs])
    recon = np.linalg.norm(X.astype(np.float64) - W @ H, ord="fro") ** 2
    preds = []
    for i in range(len(Bs)):
        y = Ys[i].astype(np.float64)
        yhat = Bs[i].astype(np.float64) @ Hs[i].astype(np.float64)
        if loss_kl:
            yh = np.maximum(yhat, eps)
            preds.append(np.sum(y * np.log(np.maximum(y / yh, eps)) - y + yh))
        else:
            preds.append(np.linalg.norm(y - yhat, ord="fro") ** 2)
    total = recon + sum(lam[i] * p for i, p in enumerate(preds))
    return np.array([total, recon] + preds)
