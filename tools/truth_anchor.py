import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from mcalf_tpu.models import AbsorptionModel, make_jax_forward

specfile = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/testdata/civ_mock_spec.txt"
model = AbsorptionModel.from_file(
    specfile,
    fitrange=[(6180.0, 6220.0)], fitlines=["CIV 1548", "CIV 1550"],
    ncomp=(1, 1), specres=[8.0],
    Nrange=[12.0, 14.5], brange=[10.0, 40.0], zrange=[2.99, 3.01],
)
fwd = make_jax_forward(model)

def ll_grid(uN, uz, ub):
    G = np.stack(np.meshgrid(uN, uz, ub, indexing="ij"), axis=-1).reshape(-1, 3)
    u = np.zeros((G.shape[0], 4), np.float32)
    u[:, 0] = 0.5
    u[:, 1:] = G
    out = np.empty(G.shape[0], np.float64)
    f = jax.jit(fwd.loglike_cube)
    Bc = 16384
    for i in range(0, G.shape[0], Bc):
        out[i:i+Bc] = np.asarray(f(jnp.asarray(u[i:i+Bc])), np.float64)
    return out

# coarse peak hunt in cube coords
uN = np.linspace(0, 1, 41); uz = np.linspace(0, 1, 2001); ub = np.linspace(0, 1, 41)
ll = ll_grid(uN, uz, ub).reshape(41, 2001, 41)
i, j, k = np.unravel_index(np.argmax(ll), ll.shape)
print("peak u:", uN[i], uz[j], ub[k], "ll=", ll[i,j,k])

N0, z0, b0 = uN[i], uz[j], ub[k]
uNf = np.linspace(max(0, N0-0.14), min(1, N0+0.14), 241)
uzf = np.linspace(max(0, z0-4e-3), min(1, z0+4e-3), 321)
ubf = np.linspace(max(0, b0-0.2), min(1, b0+0.2), 241)
llf = ll_grid(uNf, uzf, ubf).reshape(len(uNf), len(uzf), len(ubf))
m = llf.max(); w = np.exp(llf - m)
def tw(x):
    g = np.gradient(x); g[0]=(x[1]-x[0])/2; g[-1]=(x[-1]-x[-2])/2
    return g
I = np.einsum("i,j,k,ijk->", tw(uNf), tw(uzf), tw(ubf), w)
print(f"cube quadrature logZ = {m + np.log(I):.4f}   (peak ll {llf.max():.3f})")
edge = max(w[0].max(), w[-1].max(), w[:,0,:].max(), w[:,-1,:].max(), w[:,:,0].max(), w[:,:,-1].max())
print(f"max edge weight: {edge:.2e}")

# Posterior moments (quadrature): E[x], sd[x] per dimension, in PHYSICAL
# units, anchoring the sampler's posterior (not just its evidence).
wN = tw(uNf); wz = tw(uzf); wb = tw(ubf)
W = np.einsum("i,j,k,ijk->ijk", wN, wz, wb, w)
W /= W.sum()
lo = np.asarray(model.bounds_lo, np.float64)
hi = np.asarray(model.bounds_hi, np.float64)
for name, axis, grid, d in (("N", 0, uNf, 1), ("z", 1, uzf, 2), ("b", 2, ubf, 3)):
    marg = W.sum(axis=tuple(a for a in range(3) if a != axis))
    mu_u = float((grid * marg).sum())
    sd_u = float(np.sqrt(((grid - mu_u) ** 2 * marg).sum()))
    mu = lo[d] + mu_u * (hi[d] - lo[d])
    sd = sd_u * (hi[d] - lo[d])
    print(f"posterior {name}: mean = {mu:.8f}  sd = {sd:.8f}")
