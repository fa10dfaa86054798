import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
from mbrl_tpu.ops.pallas_kernels import fused_ensemble_mlp_gaussian

E, S, IN, HID, OUT = 5, 1600, 23, 200, 18
k = jax.random.PRNGKey(0)
ks = jax.random.split(k, 12)
ws = (jax.random.normal(ks[0], (E, IN, HID))*0.1,
      jax.random.normal(ks[1], (E, HID, HID))*0.1,
      jax.random.normal(ks[2], (E, HID, HID))*0.1)
bs = (jax.random.normal(ks[3], (E,1,HID))*0.1,
      jax.random.normal(ks[4], (E,1,HID))*0.1,
      jax.random.normal(ks[5], (E,1,HID))*0.1)
hw = jax.random.normal(ks[6], (E, HID, 2*OUT))*0.1
hb = jax.random.normal(ks[7], (E,1,2*OUT))*0.1
maxlv = 0.5*jnp.ones((1,OUT)); minlv = -10.0*jnp.ones((1,OUT))
x = jax.random.normal(ks[8], (E, S, IN))

def ref(x):
    h = x
    for w,b in zip(ws,bs):
        h = jax.nn.silu(jnp.einsum('ebi,eio->ebo', h, w)+b)
    out = jnp.einsum('ebi,eio->ebo', h, hw)+hb
    mean, logvar = out[...,:OUT], out[...,OUT:]
    logvar = maxlv - jax.nn.softplus(maxlv-logvar)
    logvar = minlv + jax.nn.softplus(logvar-minlv)
    return mean, logvar

seed = jnp.array([1234], jnp.int32)
mean_k = fused_ensemble_mlp_gaussian(seed, x, ws, bs, hw, hb, maxlv, minlv, out_size=OUT, tile=800, sample=False)
mean_r, logvar_r = ref(x)
err = float(jnp.max(jnp.abs(mean_k-mean_r)))
print("mean path max err:", err, flush=True)
assert err < 2e-4, err

# sampling distribution: draws should be N(mean, exp(logvar)) elementwise
N = 200
samples = []
for i in range(N):
    s = fused_ensemble_mlp_gaussian(jnp.array([i], jnp.int32), x, ws, bs, hw, hb, maxlv, minlv, out_size=OUT, tile=800, sample=True)
    samples.append(np.asarray(s))
S_ = np.stack(samples)  # (N, E, S, OUT)
emp_mean = S_.mean(0); emp_std = S_.std(0)
exp_std = np.exp(0.5*np.asarray(logvar_r))
print("mean bias (norm. by std):", float(np.abs((emp_mean-np.asarray(mean_r))/exp_std).mean()))
print("std ratio:", float((emp_std/exp_std).mean()), float((emp_std/exp_std).std()))
# cross-program independence sanity: correlation between two members' samples
a = S_[:, 0, 0, 0]; b = S_[:, 1, 0, 0]
print("cross-member corr:", float(np.corrcoef(a,b)[0,1]))
a2 = S_[:, 0, 0, 0]; b2 = S_[:, 0, 800, 0]  # different tile program
print("cross-tile corr:", float(np.corrcoef(a2,b2)[0,1]))
