# -*- coding:utf-8 -*-
"""Network zoo: 19 composable net builder functions + presets + registry.

Capability parity with ``deeptables/models/deepnets.py`` — same builder names,
same public signature ``(embeddings, flatten_emb_layer, dense_layer,
concat_emb_dense, config, model_desc)`` (the custom-net extension point,
reference deepnets.py:496-502), same presets.  Builders run inside the parent
flax module's compact scope (``DeepTabularModel.__call__``), so creating
``nn.Dense(...)`` etc. inline binds parameters exactly like the reference's
Keras functional graph building — but traced once per config and compiled by
XLA.

Nets that cannot apply (e.g. fewer than 2 embedding fields for pairwise
interactions) return ``None`` and are skipped, mirroring the reference.
"""

import inspect

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import interactions as layers
from ..ops.embedding import concat_embeddings
from ..ops.initializers import get_activation, get_initializer
from ..utils import dt_logging

logger = dt_logging.get_logger(__name__)

WideDeep = ['linear', 'dnn_nets']
DeepFM = ['linear', 'fm_nets', 'dnn_nets']
xDeepFM = ['linear', 'cin_nets', 'dnn_nets']
AutoInt = ['autoint_nets']
DCN = ['dcn_nets']
FGCNN = ['fgcnn_dnn_nets']
FiBiNet = ['fibi_dnn_nets']
PNN = ['pnn_nets']
AFM = ['afm_nets']


class _TraceContext:
    """Per-trace state shared between the model builder and net functions.

    flax requires module names to be identical between ``init`` and ``apply``
    traces, so per-trace counters (reset in ``begin_trace``) replace the
    reference's process-global ``counter.next_num`` (counter.py:6).
    """

    def __init__(self):
        self.training = False
        self.taps = {}
        self._counters = {}

    def next_num(self, name):
        self._counters[name] = self._counters.get(name, -1) + 1
        return self._counters[name]

    def tap(self, name, tensor):
        self.taps[name] = tensor


_CTX = _TraceContext()


def begin_trace(training):
    global _CTX
    _CTX = _TraceContext()
    _CTX.training = training
    return _CTX


def current_ctx():
    return _CTX


def _shape(x):
    return None if x is None else tuple(x.shape)


def linear(embeddings, flatten_emb_layer, dense_layer, concat_emb_dense,
           config, model_desc):
    """Linear (order-1) interactions (reference deepnets.py:43-66)."""
    x_emb = None
    ce = concat_embeddings(embeddings)
    if ce is not None:
        x_emb = jnp.sum(ce, axis=-1)  # (B, F)
    if x_emb is not None and dense_layer is not None:
        x = jnp.concatenate([x_emb, dense_layer], axis=-1)
    elif x_emb is not None:
        x = x_emb
    elif dense_layer is not None:
        x = dense_layer
    else:
        raise ValueError('No input layer exists.')
    input_shape = _shape(x)
    x = nn.Dense(1, use_bias=False, name='linear_logit')(x)
    model_desc.add_net('linear', input_shape, _shape(x))
    return x


def cin_nets(embeddings, flatten_emb_layer, dense_layer, concat_emb_dense,
             config, model_desc):
    """Compressed Interaction Network (reference deepnets.py:69-81)."""
    cin_concat = concat_embeddings(embeddings)
    if cin_concat is None:
        model_desc.add_net('cin', None, None)
        return None
    out = layers.CIN(params=config.cin_params, name='cin_layer')(
        cin_concat, training=_CTX.training)
    model_desc.add_net('cin', _shape(cin_concat), _shape(out))
    return out


def fm_nets(embeddings, flatten_emb_layer, dense_layer, concat_emb_dense,
            config, model_desc):
    """FM pairwise (order-2) interactions (reference deepnets.py:84-96)."""
    ce = concat_embeddings(embeddings)
    if ce is None:
        model_desc.add_net('fm', None, None)
        return None
    out = layers.FM(name='fm_layer')(ce, training=_CTX.training)
    model_desc.add_net('fm', _shape(ce), _shape(out))
    return out


def afm_nets(embeddings, flatten_emb_layer, dense_layer, concat_emb_dense,
             config, model_desc):
    """Attentional FM (reference deepnets.py:99-107)."""
    if embeddings is None or len(embeddings) < 2:
        return None
    out = layers.AFM(params=config.afm_params, name='afm_layer')(
        embeddings, training=_CTX.training)
    model_desc.add_net('afm', f'list({len(embeddings)})', _shape(out))
    return out


def opnn_nets(embeddings, flatten_emb_layer, dense_layer, concat_emb_dense,
              config, model_desc):
    """OuterProduct + DNN (reference deepnets.py:110-124)."""
    if embeddings is None or len(embeddings) < 2:
        return None
    op = layers.OuterProduct(config.pnn_params, name='outer_product_layer')(
        embeddings, training=_CTX.training)
    model_desc.add_net('opnn-outer_product', f'list({len(embeddings)})',
                       _shape(op))
    concat_all = jnp.concatenate([op, concat_emb_dense], axis=-1)
    x_dnn = dnn(concat_all, config.dnn_params, cellname='opnn')
    model_desc.add_net('opnn-dnn', _shape(concat_all), _shape(x_dnn))
    return x_dnn


def ipnn_nets(embeddings, flatten_emb_layer, dense_layer, concat_emb_dense,
              config, model_desc):
    """InnerProduct + DNN (reference deepnets.py:127-141)."""
    if embeddings is None or len(embeddings) < 2:
        return None
    ip = layers.InnerProduct(name='inner_product_layer')(
        embeddings, training=_CTX.training)
    model_desc.add_net('ipnn-inner_product', f'list({len(embeddings)})',
                       _shape(ip))
    concat_all = jnp.concatenate([ip, concat_emb_dense], axis=-1)
    x_dnn = dnn(concat_all, config.dnn_params, cellname='ipnn')
    model_desc.add_net('ipnn-dnn', _shape(concat_all), _shape(x_dnn))
    return x_dnn


def pnn_nets(embeddings, flatten_emb_layer, dense_layer, concat_emb_dense,
             config, model_desc):
    """Inner + outer product + DNN (reference deepnets.py:144-160)."""
    if embeddings is None or len(embeddings) < 2:
        return None
    ip = layers.InnerProduct(name='pnn_inner_product_layer')(
        embeddings, training=_CTX.training)
    model_desc.add_net('pnn-inner_product', f'list({len(embeddings)})',
                       _shape(ip))
    op = layers.OuterProduct(params=config.pnn_params,
                             name='pnn_outer_product_layer')(
        embeddings, training=_CTX.training)
    model_desc.add_net('pnn-outer_product', f'list({len(embeddings)})',
                       _shape(op))
    concat_all = jnp.concatenate([ip, op, concat_emb_dense], axis=-1)
    x_dnn = dnn(concat_all, config.dnn_params, cellname='pnn')
    model_desc.add_net('pnn-dnn', _shape(concat_all), _shape(x_dnn))
    return x_dnn


def dnn_nets(embeddings, flatten_emb_layer, dense_layer, concat_emb_dense,
             config, model_desc):
    """MLP over the concatenated inputs (reference deepnets.py:163-169)."""
    x_dnn = dnn(concat_emb_dense, config.dnn_params)
    model_desc.add_net('dnn', _shape(concat_emb_dense), _shape(x_dnn))
    return x_dnn


def cross_nets(embeddings, flatten_emb_layer, dense_layer, concat_emb_dense,
               config, model_desc):
    """DCN cross layers (reference deepnets.py:172-178)."""
    cross = layers.Cross(params=config.cross_params, name='cross_layer')(
        concat_emb_dense, training=_CTX.training)
    model_desc.add_net('cross', _shape(concat_emb_dense), _shape(cross))
    return cross


def cross_dnn_nets(embeddings, flatten_emb_layer, dense_layer,
                   concat_emb_dense, config, model_desc):
    """Cross → DNN (reference deepnets.py:181-191)."""
    x = concat_emb_dense
    cross = layers.Cross(params=config.cross_params, name='cross_dnn_layer')(
        x, training=_CTX.training)
    model_desc.add_net('cross_dnn-cross', _shape(x), _shape(cross))
    x_dnn = dnn(cross, config.dnn_params, cellname='cross_dnn')
    model_desc.add_net('cross_dnn-dnn', _shape(cross), _shape(x_dnn))
    return x_dnn


def dcn_nets(embeddings, flatten_emb_layer, dense_layer, concat_emb_dense,
             config, model_desc):
    """Cross ∥ DNN concat (reference deepnets.py:194-207)."""
    x = concat_emb_dense
    cross_out = layers.Cross(params=config.cross_params,
                             name='dcn_cross_layer')(x, training=_CTX.training)
    model_desc.add_net('dcn-widecross', _shape(x), _shape(cross_out))
    dnn_out = dnn(x, config.dnn_params, cellname='dcn')
    model_desc.add_net('dcn-dnn2', _shape(x), _shape(dnn_out))
    stack_out = jnp.concatenate([cross_out, dnn_out], axis=-1)
    model_desc.add_net('dcn', _shape(x), _shape(stack_out))
    return stack_out


def autoint_nets(embeddings, flatten_emb_layer, dense_layer, concat_emb_dense,
                 config, model_desc):
    """AutoInt self-attention stack (reference deepnets.py:210-224)."""
    ce = concat_embeddings(embeddings)
    if ce is None:
        model_desc.add_net('autoint', None, None)
        return None
    output = ce
    for i in range(config.autoint_params['num_attention']):
        output = layers.MultiheadAttention(
            params=config.autoint_params, name=f'autoint_attention_{i}')(
            output, training=_CTX.training)
    output = output.reshape(output.shape[0], -1)
    model_desc.add_net('autoint', _shape(ce), _shape(output))
    return output


def fg_nets(embeddings, flatten_emb_layer, dense_layer, concat_emb_dense,
            config, model_desc):
    """FGCNN feature generation (reference deepnets.py:227-261)."""
    idx = _CTX.next_num('fgcnn')
    ce = concat_embeddings(embeddings)
    if ce is None:
        model_desc.add_net('fgcnn', None, None)
        return None
    fg_inputs = ce[..., None]  # (B, F, E, 1)
    p = config.fgcnn_params
    fg_filters = p.get('fg_filters', (14, 16))
    fg_heights = p.get('fg_heights', (7, 7))
    fg_pool_heights = p.get('fg_pool_heights', (2, 2))
    fg_new_feat_filters = p.get('fg_new_feat_filters', (2, 2))
    new_features = []
    for stage, (filters, height, pool, new_filters) in enumerate(
            zip(fg_filters, fg_heights, fg_pool_heights, fg_new_feat_filters)):
        fg_inputs, new_feats = layers.FGCNN(
            filters=filters, kernel_height=height, pool_height=pool,
            new_filters=new_filters,
            name=f'fgcnn_{idx}_stage_{stage}')(fg_inputs,
                                               training=_CTX.training)
        new_features.append(new_feats)
    concat_all = jnp.concatenate(new_features + [ce], axis=1)
    model_desc.add_net('fg', _shape(ce), _shape(concat_all))
    return concat_all


def fgcnn_cin_nets(embeddings, flatten_emb_layer, dense_layer,
                   concat_emb_dense, config, model_desc):
    """FGCNN → CIN (reference deepnets.py:264-275)."""
    fg_output = fg_nets(embeddings, flatten_emb_layer, dense_layer,
                        concat_emb_dense, config, model_desc)
    if fg_output is None:
        return None
    out = layers.CIN(params=config.cin_params, name='fgcnn_cin_layer')(
        fg_output, training=_CTX.training)
    model_desc.add_net('fgcnn-cin', _shape(fg_output), _shape(out))
    return out


def fgcnn_fm_nets(embeddings, flatten_emb_layer, dense_layer,
                  concat_emb_dense, config, model_desc):
    """FGCNN → FM (reference deepnets.py:278-289)."""
    fg_output = fg_nets(embeddings, flatten_emb_layer, dense_layer,
                        concat_emb_dense, config, model_desc)
    if fg_output is None:
        return None
    out = layers.FM(name='fm_fgcnn_layer')(fg_output, training=_CTX.training)
    model_desc.add_net('fgcnn-fm', _shape(fg_output), _shape(out))
    return out


def fgcnn_afm_nets(embeddings, flatten_emb_layer, dense_layer,
                   concat_emb_dense, config, model_desc):
    """FGCNN → AFM (reference deepnets.py:292-303)."""
    fg_output = fg_nets(embeddings, flatten_emb_layer, dense_layer,
                        concat_emb_dense, config, model_desc)
    if fg_output is None:
        return None
    out = layers.AFM(params=config.afm_params, name='fgcnn_afm_layer')(
        fg_output, training=_CTX.training)
    model_desc.add_net('fgcnn-afm', _shape(fg_output), _shape(out))
    return out


def fgcnn_ipnn_nets(embeddings, flatten_emb_layer, dense_layer,
                    concat_emb_dense, config, model_desc):
    """FGCNN → InnerProduct + DNN (reference deepnets.py:306-323)."""
    fg_output = fg_nets(embeddings, flatten_emb_layer, dense_layer,
                        concat_emb_dense, config, model_desc)
    if fg_output is None:
        return None
    inner_product = layers.InnerProduct(name='fgcnn_inner_product_layer')(
        fg_output, training=_CTX.training)
    dnn_input_layers = [fg_output.reshape(fg_output.shape[0], -1),
                        inner_product]
    if dense_layer is not None:
        dnn_input_layers.append(dense_layer)
    dnn_input = jnp.concatenate(dnn_input_layers, axis=-1)
    dnn_out = dnn(dnn_input, config.dnn_params, cellname='fgcnn_ipnn')
    model_desc.add_net('fgcnn-ipnn', _shape(fg_output), _shape(dnn_out))
    return dnn_out


def fgcnn_dnn_nets(embeddings, flatten_emb_layer, dense_layer,
                   concat_emb_dense, config, model_desc):
    """FGCNN → DNN (reference deepnets.py:326-341)."""
    fg_output = fg_nets(embeddings, flatten_emb_layer, dense_layer,
                        concat_emb_dense, config, model_desc)
    if fg_output is None:
        return None
    flat = fg_output.reshape(fg_output.shape[0], -1)
    if dense_layer is not None:
        dnn_input = jnp.concatenate([flat, dense_layer], axis=-1)
    else:
        dnn_input = flat
    dnn_out = dnn(dnn_input, config.dnn_params, cellname='fgcnn_dnn')
    model_desc.add_net('fgcnn-dnn', _shape(fg_output), _shape(dnn_out))
    return dnn_out


def fibi_nets(embeddings, flatten_emb_layer, dense_layer, concat_emb_dense,
              config, model_desc):
    """FiBiNet SENET + bilinear interactions (reference deepnets.py:344-371)."""
    idx = _CTX.next_num('senet')
    ce = concat_embeddings(embeddings)
    if ce is None:
        model_desc.add_net('fibi', None, None)
        return None
    p = config.fibinet_params
    senet_pooling_op = p.get('senet_pooling_op', 'mean')
    senet_reduction_ratio = p.get('senet_reduction_ratio', 3)
    bilinear_type = p.get('bilinear_type', 'field_interaction')

    senet_embedding = layers.SENET(
        pooling_op=senet_pooling_op, reduction_ratio=senet_reduction_ratio,
        name=f'senet_layer_{idx}')(ce, training=_CTX.training)
    senet_bilinear_out = layers.BilinearInteraction(
        bilinear_type=bilinear_type, name=f'senet_bilinear_layer_{idx}')(
        senet_embedding, training=_CTX.training)
    bilinear_out = layers.BilinearInteraction(
        bilinear_type=bilinear_type, name=f'embedding_bilinear_layer_{idx}')(
        ce, training=_CTX.training)
    concat_bilinear = jnp.concatenate([senet_bilinear_out, bilinear_out],
                                      axis=1)
    model_desc.add_net('fibi', _shape(ce), _shape(concat_bilinear))
    return concat_bilinear


def fibi_dnn_nets(embeddings, flatten_emb_layer, dense_layer,
                  concat_emb_dense, config, model_desc):
    """FiBiNet → DNN (reference deepnets.py:374-386)."""
    if embeddings is None or len(embeddings) <= 1:
        return None
    fibi_output = fibi_nets(embeddings, flatten_emb_layer, dense_layer,
                            concat_emb_dense, config, model_desc)
    parts = [fibi_output.reshape(fibi_output.shape[0], -1)]
    if dense_layer is not None:
        parts.append(dense_layer)
    dnn_input = jnp.concatenate(parts, axis=-1)
    dnn_out = dnn(dnn_input, config.dnn_params, cellname='fibi_dnn')
    model_desc.add_net('fibi-dnn', _shape(fibi_output), _shape(dnn_out))
    return dnn_out


def dnn(x, params, cellname='dnn'):
    """Shared MLP builder (reference deepnets.py:401-427).

    Dense outputs are tapped under their layer names (e.g. 'dnn_dense_1') so
    ``DeepTable.apply(output_layers=[...])`` can fetch them like the
    reference's Keras-layer outputs.
    """
    custom_dnn_fn = params.get('custom_dnn_fn')
    if isinstance(custom_dnn_fn, str):
        # persisted-by-name (save/load round-trip) — see register_custom_objects
        custom_dnn_fn = get_custom_object(custom_dnn_fn)
    if custom_dnn_fn is not None:
        return custom_dnn_fn(x, params, cellname + '_custom')

    hidden_units = params.get('hidden_units', ((128, 0, True), (64, 0, False)))
    activation = get_activation(params.get('activation', 'relu'))
    kernel_init = get_initializer(params.get('kernel_initializer',
                                             'he_uniform'))
    if len(hidden_units) <= 0:
        raise ValueError(
            '[hidden_units] must be a list of tuple([units],[dropout_rate],'
            '[use_bn]) and at least one tuple.')
    for index, (units, dropout, batch_norm) in enumerate(hidden_units, 1):
        name = f'{cellname}_dense_{index}'
        x = nn.Dense(units, use_bias=not batch_norm, kernel_init=kernel_init,
                     name=name)(x)
        _CTX.tap(name, x)
        if batch_norm:
            x = nn.BatchNorm(use_running_average=not _CTX.training,
                             momentum=0.9, epsilon=1e-3,
                             name=f'{cellname}_bn_{index}')(x)
        x = activation(x)
        if dropout > 0:
            x = nn.Dropout(dropout, name=f'{cellname}_dropout_{index}')(
                x, deterministic=not _CTX.training)
    return x


def custom_dnn_D_A_D_B(x, params, cellname='dnn_D_A_D_B'):
    """Dense→Act→Dropout→BN ordering variant (reference deepnets.py:430-452)."""
    hidden_units = params.get('hidden_units', ((128, 0, True), (64, 0, False)))
    activation = get_activation(params.get('activation', 'relu'))
    kernel_init = get_initializer(params.get('kernel_initializer',
                                             'he_uniform'))
    if len(hidden_units) <= 0:
        raise ValueError(
            '[hidden_units] must be a list of tuple([units],[dropout_rate],'
            '[use_bn]) and at least one tuple.')
    for index, (units, dropout, batch_norm) in enumerate(hidden_units, 1):
        name = f'{cellname}_dense_{index}'
        x = nn.Dense(units, kernel_init=kernel_init, name=name)(x)
        x = activation(x)
        _CTX.tap(name, x)
        if dropout > 0:
            x = nn.Dropout(dropout, name=f'{cellname}_dropout_{index}')(
                x, deterministic=not _CTX.training)
        if batch_norm:
            x = nn.BatchNorm(use_running_average=not _CTX.training,
                             momentum=0.9, epsilon=1e-3,
                             name=f'{cellname}_bn_{index}')(x)
    return x


_BUILTIN = {
    'linear': linear,
    'cin_nets': cin_nets,
    'fm_nets': fm_nets,
    'afm_nets': afm_nets,
    'opnn_nets': opnn_nets,
    'ipnn_nets': ipnn_nets,
    'pnn_nets': pnn_nets,
    'dnn_nets': dnn_nets,
    'cross_nets': cross_nets,
    'cross_dnn_nets': cross_dnn_nets,
    'dcn_nets': dcn_nets,
    'autoint_nets': autoint_nets,
    'fg_nets': fg_nets,
    'fgcnn_cin_nets': fgcnn_cin_nets,
    'fgcnn_fm_nets': fgcnn_fm_nets,
    'fgcnn_afm_nets': fgcnn_afm_nets,
    'fgcnn_ipnn_nets': fgcnn_ipnn_nets,
    'fgcnn_dnn_nets': fgcnn_dnn_nets,
    'fibi_nets': fibi_nets,
    'fibi_dnn_nets': fibi_dnn_nets,
}

custom_nets = {}


def get(identifier):
    """Resolve a net name or callable (reference deepnets.py:455-478)."""
    if identifier is None:
        raise ValueError('identifier can not be none.')
    if isinstance(identifier, str):
        fn = custom_nets.get(identifier) or _BUILTIN.get(identifier) \
            or dt_custom_objects.get(identifier)
        if fn is None:
            raise ValueError(
                f'Unknown nets function: {identifier!r}. If this model was '
                f'saved with a custom net, re-register it with '
                f'register_custom_objects(...) or pass custom_objects= to '
                f'load().')
        return fn
    elif callable(identifier):
        register_nets(identifier)
        return identifier
    raise TypeError(
        f'Could not interpret nets function identifier: {identifier!r}')


def get_nets(nets):
    """Normalize a mixed list of names/callables into names
    (reference deepnets.py:484-493). Order-preserving de-duplication."""
    str_nets = []
    seen = set()
    for net in nets:
        name = net if isinstance(net, str) else register_nets(net)
        if name not in seen:
            seen.add(name)
            str_nets.append(name)
    return str_nets


def register_nets(nets_fn):
    """Register a custom net (reference deepnets.py:496-502); the signature
    must match ``linear``'s — the documented extension contract."""
    if not callable(nets_fn):
        raise ValueError('nets_fn must be a valid callable function.')
    if inspect.signature(nets_fn) != inspect.signature(linear):
        raise ValueError(
            f'Signature of nets_fn is invalid, expect '
            f'{inspect.signature(linear)} but {inspect.signature(nets_fn)}')
    custom_nets[nets_fn.__name__] = nets_fn
    return nets_fn.__name__


# ---------------------------------------------------------------------------
# Custom-object registry for save/load round-trips.
#
# Parity with the reference's ``dt_custom_objects`` + ``register_custom_objects``
# (deeptables/models/layers.py:1165-1186): models whose config carries custom
# callables (net builders in ``config.nets``, ``dnn_params['custom_dnn_fn']``)
# persist those callables *by name*; at load time the name is resolved through
# this registry — loudly failing if the user has not re-registered the object.
# ---------------------------------------------------------------------------
dt_custom_objects = {}


def register_custom_objects(objects):
    """Register custom callables so saved models can resolve them at load.

    ``objects`` may be a dict ``{name: callable}``, a single callable, or an
    iterable of callables (named by ``__name__``).  Callables whose signature
    matches the net-builder contract are additionally registered as nets.
    """
    if objects is None:
        return
    if callable(objects):
        objects = [objects]
    items = objects.items() if isinstance(objects, dict) else \
        [(getattr(o, '__name__', None), o) for o in objects]
    for name, obj in items:
        if not name or name == '<lambda>' or not callable(obj):
            raise ValueError(
                f'Custom objects must be named callables (got name={name!r}, '
                f'obj={obj!r}); lambdas cannot round-trip save/load.')
        dt_custom_objects[name] = obj
        try:
            register_nets(obj)
        except ValueError:
            pass  # not a net builder — registry entry alone is enough


def get_custom_object(name):
    """Resolve a persisted custom-object name; raises if unregistered."""
    fn = dt_custom_objects.get(name) or custom_nets.get(name)
    if fn is None:
        fn = globals().get(name)  # builtins like custom_dnn_D_A_D_B
    if fn is None or not callable(fn):
        raise ValueError(
            f'Unknown custom object {name!r}: this model was saved with a '
            f'custom callable. Re-register it with '
            f'deeptables_tpu.models.register_custom_objects(...) or pass '
            f'custom_objects={{{name!r}: fn}} to load().')
    return fn
