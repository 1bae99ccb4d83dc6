import sys, time, json
sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from video_encoder_tpu.codec import entropy, spec

H, W = 1088, 1920
nby, nbx = H // 16, W // 16
rng = np.random.default_rng(11)
lz_y = jnp.asarray(np.where(rng.random((2*nby, 2*nbx, 64)) < 0.12,
                            rng.integers(-40, 41, (2*nby, 2*nbx, 64)), 0).astype(np.int32))
lz_cb = jnp.asarray(np.where(rng.random((nby, nbx, 64)) < 0.08,
                             rng.integers(-20, 21, (nby, nbx, 64)), 0).astype(np.int32))
qpd = jnp.zeros((nby, nbx), jnp.int32)
inter = jnp.asarray(rng.random((nby, nbx)) < 0.8)
dy = jnp.asarray(rng.integers(-16, 17, (nby, nbx), np.int32))
dx = jnp.asarray(rng.integers(-16, 17, (nby, nbx), np.int32))
bw = 24
n_words = entropy.capacity_words(nby * nbx, 1024)

def t(fn, name, reps=20):
    f = jax.jit(fn)
    r = f(lz_y, lz_cb, qpd, inter, dy, dx)
    jax.tree.map(lambda a: np.asarray(a) if hasattr(a, 'shape') else a, r)
    t0 = time.perf_counter()
    for _ in range(reps):
        r = f(lz_y, lz_cb, qpd, inter, dy, dx)
    np.asarray(jax.tree.leaves(r)[0])
    print(json.dumps({name: round((time.perf_counter()-t0)/reps*1e3, 2)}), flush=True)

def pieces_only(lz_y, lz_cb, qpd, inter, dy, dx):
    pw, pb, mb, o = entropy._frame_pieces(lz_y, lz_cb, lz_cb, qpd, True, inter, dy, dx, bw)
    return pw.sum(), pb.sum()

def pieces_tree(lz_y, lz_cb, qpd, inter, dy, dx):
    return entropy.pack_frame_planes(lz_y, lz_cb, lz_cb, qpd, True, inter, dy, dx, bw, n_words)[1]

def pieces_chunks(lz_y, lz_cb, qpd, inter, dy, dx):
    cw_, cb_, _, _ = entropy.pack_frame_chunks(lz_y, lz_cb, lz_cb, qpd, True, inter, dy, dx, bw)
    return cw_.sum(), cb_.sum()

def symbols_only(lz_y, lz_cb, qpd, inter, dy, dx):
    yv, yl = entropy.block_symbols(lz_y)
    cv, cl = entropy.block_symbols(lz_cb)
    return yv.sum(), yl.sum(), cv.sum(), cl.sum()

t(symbols_only, "symbols_only")
t(pieces_only, "pieces_only(symbols+pack_dense)")
t(pieces_tree, "pieces+tree_concat")
t(pieces_chunks, "pieces+chunk_merge")
