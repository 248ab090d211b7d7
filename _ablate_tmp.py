import os, time, json
import numpy as np, jax, jax.numpy as jnp, optax
from deeptables_tpu.data.datasets import load_criteo_synthetic
from deeptables_tpu.models.config import ModelConfig
from deeptables_tpu.models.deepmodel import DeepModel
from deeptables_tpu.models.metainfo import CategoricalColumn, ContinuousColumn
from deeptables_tpu.ops import losses as losses_lib

B=8192; emb=16
cat,dense,y,voc=load_criteo_synthetic(n_rows=B*2, return_arrays=True)

def build(nets, dnn=True):
    cfg=ModelConfig(nets=nets, metrics=['AUC'], task='binary', embedding_dropout=0,
        embeddings_output_dim=emb,
        dnn_params={'hidden_units':((1024,0,False),(512,0,False)),'activation':'relu'},
        dtype_policy='bfloat16', home_dir='/tmp/dt_bench')
    cc=tuple(CategoricalColumn(f'C{i+1}',int(v)+1,emb) for i,v in enumerate(voc))
    ct=(ContinuousColumn('input_continuous_all',[f'I{i+1}' for i in range(dense.shape[1])]),)
    m=DeepModel('binary',2,cfg,cc,ct)
    sample={'cat':cat[:B],'input_continuous_all':dense[:B]}
    m.build(sample_batch=sample)
    return m

def timeit(m, mode='train'):
    tx=optax.adam(1e-3)
    opt=jax.jit(tx.init)(m.variables['params'])
    mod=m.module; lf=losses_lib.binary_crossentropy
    batch={'cat':jax.device_put(cat[:B]),'input_continuous_all':jax.device_put(dense[:B])}
    yb=jax.device_put(y[:B]); rng=jax.random.PRNGKey(0)
    if mode=='fwd':
        def f(p,bs,b):
            (lg,_),_=mod.apply({'params':p,'batch_stats':bs},b,training=True,rngs={'dropout':rng},mutable=['batch_stats'])
            return lf(lg,yb)
        st=jax.jit(f)
        args=lambda s:(s[0],s[1],batch)
        state=(m.variables['params'],m.variables.get('batch_stats',{}))
        run=lambda s: (s, st(*args(s)))
    elif mode=='grad':
        def f(p,bs,b):
            def cl(pp):
                (lg,_),mu=mod.apply({'params':pp,'batch_stats':bs},b,training=True,rngs={'dropout':rng},mutable=['batch_stats'])
                return lf(lg,yb), mu.get('batch_stats',{})
            (l,nbs),g=jax.value_and_grad(cl,has_aux=True)(p)
            return l,g
        st=jax.jit(f)
        state=(m.variables['params'],m.variables.get('batch_stats',{}))
        run=lambda s:(s, st(s[0],s[1],batch)[0])
    else:
        def f(p,bs,o,b):
            def cl(pp):
                (lg,_),mu=mod.apply({'params':pp,'batch_stats':bs},b,training=True,rngs={'dropout':rng},mutable=['batch_stats'])
                return lf(lg,yb), mu.get('batch_stats',{})
            (l,nbs),g=jax.value_and_grad(cl,has_aux=True)(p)
            u,no=tx.update(g,o,p)
            return optax.apply_updates(p,u),nbs,no,l
        st=jax.jit(f,donate_argnums=(0,1,2))
        state=(m.variables['params'],m.variables.get('batch_stats',{}),opt)
        def run(s):
            p,bs,o,l=st(s[0],s[1],s[2],batch)
            return (p,bs,o),l
    for _ in range(10):
        state,l=run(state)
    jax.block_until_ready(l)
    t0=time.perf_counter(); n=0
    while time.perf_counter()-t0<3.0:
        for _ in range(20):
            state,l=run(state); n+=1
        jax.block_until_ready(l)
    el=time.perf_counter()-t0
    return el/n*1e3

m=build(['linear','fm_nets','dnn_nets'])
print('deepfm full step ms:', round(timeit(m),3))
print('deepfm fwd only  ms:', round(timeit(m,'fwd'),3))
print('deepfm fwd+bwd   ms:', round(timeit(m,'grad'),3))
m2=build(['dnn_nets'])
print('dnn-only step    ms:', round(timeit(m2),3))
m3=build(['linear','fm_nets'])
print('linear+fm step   ms:', round(timeit(m3),3))
