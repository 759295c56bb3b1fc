"""On-device greedy sampling with no-repeat-ngram constraint.

The reference builds the n-gram ban table on the host every step and round-
trips logits to the CPU when the argmax is banned (main.rs:96-120,
1562-1598). Here the ban mask is built on-device over the static token
buffer, so the decode loop never ships logits to the host.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ngram_ban_mask(
    tokens: jnp.ndarray,  # [T] i32 token buffer (prompt + generated, padded)
    cur_len: jnp.ndarray,  # scalar i32: number of valid tokens
    ngram_size: int,  # static
    vocab_size: int,  # static
) -> jnp.ndarray:
    """Bool [vocab] mask, True = banned next token.

    Semantics match reference main.rs:96-120: for every window
    tokens[i : i+n-1] equal to the current suffix tokens[cur_len-n+1 : cur_len],
    the continuation tokens[i+n-1] is banned. Windows run over the whole
    sequence including the prompt.
    """
    if ngram_size == 0:
        return jnp.zeros((vocab_size,), dtype=bool)
    t = tokens.shape[0]
    prefix_len = ngram_size - 1
    if t < ngram_size:
        return jnp.zeros((vocab_size,), dtype=bool)

    tokens = tokens.astype(jnp.int32)
    # Current prefix: tokens[cur_len - prefix_len : cur_len].
    start = jnp.maximum(cur_len - prefix_len, 0)
    prefix = jnp.take(
        tokens, start + jnp.arange(prefix_len), axis=0, mode="clip"
    )  # [prefix_len]

    # All windows tokens[i : i + prefix_len] for i in [0, T - prefix_len].
    # Shifted-compare form: window j-th elements are the contiguous slice
    # tokens[j : j + n_win], so the match reduction is prefix_len vector
    # compares over slices instead of an [n_win, prefix_len] gather (the
    # gather was ~2x the cost of this whole op at T=2048, n=20).
    n_win = t - prefix_len  # windows whose continuation index i+prefix_len < T
    matches = jnp.ones((n_win,), dtype=bool)
    for j in range(prefix_len):
        matches &= jax.lax.slice_in_dim(tokens, j, j + n_win) == prefix[j]

    # Window must lie fully within the valid ids: i + ngram <= cur_len
    # (reference iterates i in 0..=len-n over the realized id list).
    i_arange = jnp.arange(n_win)
    valid = (i_arange + ngram_size) <= cur_len
    # Only ban when we actually have a full prefix (cur_len >= prefix_len).
    valid = valid & (cur_len >= prefix_len) & matches

    next_tokens = tokens[prefix_len:]  # [n_win] continuation of each window
    mask = jnp.zeros((vocab_size,), dtype=bool)
    return mask.at[next_tokens].max(valid)


def greedy_pick(logits: jnp.ndarray, ban_mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """Greedy argmax with optional ban mask; NaNs never win.

    Matches the reference scan semantics (main.rs:20-40): first maximal index
    wins; NaN logits are skipped.
    """
    l32 = logits.astype(jnp.float32)
    neg = jnp.float32(-jnp.inf)
    l32 = jnp.where(jnp.isnan(l32), neg, l32)
    if ban_mask is not None:
        l32 = jnp.where(ban_mask, neg, l32)
    return jnp.argmax(l32, axis=-1).astype(jnp.int32)


def sample_pick(
    logits: jnp.ndarray,  # [V]
    key,
    ban_mask: jnp.ndarray | None = None,
    *,
    temperature: float = 1.0,
    top_k: int = 0,
    top_p: float = 1.0,
    nucleus_candidates: int = 1024,
) -> jnp.ndarray:
    """On-device stochastic sampling (beyond-reference; the reference is
    greedy-only).

    - temperature == 0 -> greedy (exact `greedy_pick` semantics);
    - top_k > 0 -> sample within the k most likely tokens;
    - top_p < 1 -> nucleus sampling over the `nucleus_candidates` most likely
      tokens (covers any practical nucleus; documented approximation);
    - otherwise full-vocab categorical via Gumbel-max (no sort).
    """
    import jax

    if temperature == 0.0:
        return greedy_pick(logits, ban_mask)

    l32 = logits.astype(jnp.float32)
    neg = jnp.float32(-jnp.inf)
    l32 = jnp.where(jnp.isnan(l32), neg, l32)
    if ban_mask is not None:
        l32 = jnp.where(ban_mask, neg, l32)
    l32 = l32 / jnp.float32(temperature)

    if top_k <= 0 and top_p >= 1.0:
        return jax.random.categorical(key, l32).astype(jnp.int32)

    k = top_k if top_k > 0 else nucleus_candidates
    k = min(k, l32.shape[-1])
    vals, idx = jax.lax.top_k(l32, k)  # sorted descending
    if top_p < 1.0:
        probs = jax.nn.softmax(vals)
        cum = jnp.cumsum(probs)
        # Keep tokens whose preceding cumulative mass is < top_p (always
        # keeps the most likely token).
        keep = (cum - probs) < jnp.float32(top_p)
        vals = jnp.where(keep, vals, neg)
    choice = jax.random.categorical(key, vals)
    # If the ban mask wiped out every top-k candidate, categorical over an
    # all--inf row is arbitrary; fall back to greedy over the full banned-
    # masked vocab (the greedy path's behavior).
    any_ok = jnp.isfinite(vals).any()
    fallback = jnp.argmax(l32, axis=-1).astype(jnp.int32)
    return jnp.where(any_ok, idx[choice].astype(jnp.int32), fallback)
