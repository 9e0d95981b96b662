"""Tests for the YAML -> JAX DSL (expression compiler, template parser, lowering).

Golden values are checked against hand-written vector fields -- the same
decoupling seam the reference test-suite uses
(/root/reference/rectipy_tests/test_nodes.py:32-33).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from rectipy_tpu.dsl import (
    ExprError,
    NodeTemplate,
    evaluate,
    free_symbols,
    load_template,
    lower,
    parse,
    split_equation,
    substitute,
)

DT = jnp.float64


# ---------------------------------------------------------------- expressions


def test_parse_and_eval_arithmetic():
    env = {"v": jnp.array([1.0, 2.0]), "tau": 2.0, "eta": jnp.array([0.5, -0.5])}
    ast = parse("-v/tau + eta + 3.0*v^2")
    out = np.asarray(evaluate(ast, env))
    expect = -np.array([1.0, 2.0]) / 2.0 + np.array([0.5, -0.5]) + 3.0 * np.array([1.0, 4.0])
    np.testing.assert_allclose(out, expect)


def test_power_right_associative_and_precedence():
    env = {"x": 2.0}
    assert float(evaluate(parse("x^3^2"), env)) == pytest.approx(2.0 ** 9)
    assert float(evaluate(parse("-x^2"), env)) == pytest.approx(-4.0)
    assert float(evaluate(parse("2*x + 1"), env)) == pytest.approx(5.0)


def test_functions_and_mean():
    env = {"v": jnp.array([0.0, 1.0, 2.0])}
    np.testing.assert_allclose(np.asarray(evaluate(parse("tanh(v)"), env)), np.tanh([0.0, 1.0, 2.0]))
    assert float(evaluate(parse("mean(v)"), env)) == pytest.approx(1.0)
    out = np.asarray(evaluate(parse("v - mean(v)"), env))
    np.testing.assert_allclose(out, [-1.0, 0.0, 1.0])


def test_exprel_safe_value_and_gradient():
    """exprel(x) = (exp(x)-1)/x with the x=0 singularity filled in; value and
    gradient are finite and correct on AND around the singular point (the
    Hodgkin-Huxley gate-rate use case)."""
    import jax

    ast = parse("exprel(x)")
    # away from 0: plain (exp(x)-1)/x
    for x in (-3.0, -0.5, 0.5, 2.0):
        assert float(evaluate(ast, {"x": jnp.asarray(x)})) == pytest.approx(
            float(np.expm1(x) / x), rel=1e-12)
    # at 0: the limit, exactly 1
    assert float(evaluate(ast, {"x": jnp.asarray(0.0)})) == pytest.approx(1.0)
    # gradient at 0 is 1/2 and NaN-free (double-where)
    g = jax.grad(lambda x: evaluate(ast, {"x": x}))(jnp.asarray(0.0))
    assert float(g) == pytest.approx(0.5, abs=1e-6)
    # vectorized with a singular entry in the middle
    v = np.asarray(evaluate(ast, {"x": jnp.asarray([-1.0, 0.0, 1.0])}))
    np.testing.assert_allclose(v, [np.expm1(-1.0) / -1.0, 1.0, np.expm1(1.0)], rtol=1e-6)


def test_free_symbols():
    assert free_symbols(parse("(v^2 + eta + I_ext)/tau + k*s_in")) == {
        "v", "eta", "I_ext", "tau", "k", "s_in",
    }
    assert free_symbols(parse("mean(v) + 2.0")) == {"v"}


def test_split_equation():
    lhs, is_ode, _ = split_equation("v' = -v/tau")
    assert lhs == "v" and is_ode
    lhs, is_ode, _ = split_equation("r = tanh(v)")
    assert lhs == "r" and not is_ode
    with pytest.raises(ExprError):
        split_equation("v + 1")


def test_substitute_word_boundaries():
    # 'eta' must not clobber 'beta' or 'theta'
    out = substitute("v' = beta*v + eta + theta", "eta", "eta - x")
    assert "beta*v" in out and "theta" in out
    assert "(eta - x)" in out
    # multi-token literal replacement
    out = substitute("v' = -v/tau + k*r_in + I_ext", "k*r_in", "k*s_in")
    assert "(k*s_in)" in out and "r_in" not in out.replace("(k*s_in)", "")


def test_tokenizer_rejects_garbage():
    with pytest.raises(ExprError):
        parse("v @ w")


# ------------------------------------------------------------------ templates


def test_load_node_template():
    tpl = NodeTemplate.from_yaml("rectipy_tpu.models.rate_neurons.leaky_integrator.tanh")
    assert tpl.name == "tanh"
    assert [op.name for op in tpl.operators] == ["li_op", "tanh_op"]
    li = tpl.operators[0]
    assert li.variables["tau"].default == 10.0
    assert li.variables["v"].role == "output"
    assert li.variables["I_ext"].role == "input"


def test_reference_path_compat():
    # reference user scripts address templates via the neuron_model_templates prefix
    tpl = NodeTemplate.from_yaml("neuron_model_templates.spiking_neurons.qif.qif")
    assert tpl.operators[0].name == "qif_op"
    tpl2 = NodeTemplate.from_yaml("model_templates.base_templates.tanh_node")
    assert [op.name for op in tpl2.operators] == ["li_op", "tanh_op"]


def test_operator_inheritance_lif():
    tpl = NodeTemplate.from_yaml("rectipy_tpu.models.spiking_neurons.lif.lif")
    op = tpl.operators[0]
    assert op.name == "lif_op"
    eqs = " | ".join(op.equations)
    assert "s_in" in eqs and "spike" in eqs
    # replaced drive: no bare r_in multiplication left
    assert "r_in" not in eqs
    assert op.variables["tau"].default == 10.0  # inherited from li_op
    assert op.variables["tau_s"].default == 0.5


def test_operator_inheritance_sfa():
    tpl = NodeTemplate.from_yaml("rectipy_tpu.models.spiking_neurons.qif.qif_sfa")
    op = tpl.operators[0]
    eqs = " | ".join(op.equations)
    assert "(eta - x)" in eqs
    assert any("tau_x" in e for e in op.equations)


def test_missing_template_errors():
    with pytest.raises(FileNotFoundError):
        NodeTemplate.from_yaml("rectipy_tpu.models.rate_neurons.freaky_integrator.tanh")
    with pytest.raises(AttributeError):
        NodeTemplate.from_yaml("rectipy_tpu.models.rate_neurons.leaky_integrator.tan")


# ------------------------------------------------------------------- lowering


def _tanh_reference(y, W, I_ext, tau, k, eta):
    """Hand-written li_op+tanh_op vector field: v' = -v/tau + k*(W@tanh(v)) + I_ext + eta."""
    return -y / tau + k * (W @ np.tanh(y)) + I_ext + eta


def test_lower_tanh_matches_handwritten():
    n = 7
    rng = np.random.default_rng(0)
    W = rng.normal(size=(n, n))
    vf = lower(
        "rectipy_tpu.models.rate_neurons.leaky_integrator.tanh",
        weights=W,
        source_var="tanh_op/r",
        target_var="li_op/r_in",
        dtype=DT,
    )
    assert vf.n == n
    assert vf.var_map["li_op/v"] == (0, n)
    assert vf.var_map["v"] == (0, n)  # unambiguous bare alias
    y = jnp.asarray(rng.normal(size=(n,)), dtype=DT)
    args = dict(vf.args)
    x = rng.normal(size=(n,))
    args["li_op/I_ext"] = jnp.asarray(x, dtype=DT)
    dy = np.asarray(vf.func(0.0, y, args))
    expect = _tanh_reference(np.asarray(y), W, x, 10.0, 1.0, 0.0)
    np.testing.assert_allclose(dy, expect, rtol=1e-12, atol=1e-12)


def test_lower_node_vars_overrides():
    n = 5
    rng = np.random.default_rng(1)
    W = np.zeros((n, n))
    tau = rng.uniform(10.0, 20.0, size=(n,))
    vf = lower(
        "rectipy_tpu.models.rate_neurons.leaky_integrator.tanh",
        weights=W,
        source_var="tanh_op/r",
        target_var="li_op/r_in",
        node_vars={"all/li_op/tau": tau, "all/li_op/eta": 2.0, "all/li_op/v": np.ones(n)},
        dtype=DT,
    )
    np.testing.assert_allclose(np.asarray(vf.args["li_op/tau"]), tau)
    assert float(vf.args["li_op/eta"]) == 2.0
    np.testing.assert_allclose(np.asarray(vf.y0), np.ones(n))
    y = jnp.zeros(n, dtype=DT)
    dy = np.asarray(vf.func(0.0, y, vf.args))
    np.testing.assert_allclose(dy, np.full(n, 2.0), rtol=1e-12)


def test_lower_qif_two_state_vars():
    n = 4
    rng = np.random.default_rng(2)
    W = rng.normal(size=(n, n))
    vf = lower(
        "rectipy_tpu.models.spiking_neurons.qif.qif",
        weights=W,
        source_var="s",
        target_var="s_in",
        dtype=DT,
    )
    assert vf.var_map["qif_op/v"] == (0, n)
    assert vf.var_map["qif_op/s"] == (n, 2 * n)
    np.testing.assert_allclose(np.asarray(vf.y0[:n]), -2.0)
    v = rng.normal(size=(n,))
    s = rng.normal(size=(n,))
    y = jnp.asarray(np.concatenate([v, s]), dtype=DT)
    args = dict(vf.args)
    spike = rng.normal(size=(n,))
    args["qif_op/spike"] = jnp.asarray(spike, dtype=DT)
    dy = np.asarray(vf.func(0.0, y, args))
    dv = (v ** 2 - 5.0) / 1.0 + 1.0 * (W @ s)
    ds = -s / 1.0 + spike
    np.testing.assert_allclose(dy[:n], dv, rtol=1e-12)
    np.testing.assert_allclose(dy[n:], ds, rtol=1e-12)


def test_lower_ik_mean_reduction():
    n = 6
    rng = np.random.default_rng(3)
    vf = lower(
        "rectipy_tpu.models.spiking_neurons.ik.iku",
        n=n,
        dtype=DT,
    )
    v = rng.normal(size=(n,)) - 60.0
    u = rng.normal(size=(n,))
    s = rng.normal(size=(n,))
    y = jnp.asarray(np.concatenate([v, u, s]), dtype=DT)
    dy = np.asarray(vf.func(0.0, y, vf.args))
    du = (-2.0 * (np.mean(v) + 60.0) - u) / 33.33
    np.testing.assert_allclose(dy[n:2 * n], du, rtol=1e-10)


def test_lower_errors():
    n = 3
    with pytest.raises(ValueError):
        lower("rectipy_tpu.models.rate_neurons.leaky_integrator.tanh", weights=np.zeros((n, n)))
    with pytest.raises(KeyError):
        lower(
            "rectipy_tpu.models.rate_neurons.leaky_integrator.tanh",
            weights=np.zeros((n, n)),
            source_var="x",
            target_var="li_op/r_in",
        )
    with pytest.raises(ValueError):
        lower("rectipy_tpu.models.rate_neurons.leaky_integrator.tanh", n=None)


def test_lower_scalar_params_stay_scalar():
    vf = lower(
        "rectipy_tpu.models.rate_neurons.leaky_integrator.tanh",
        n=4,
        dtype=DT,
    )
    assert vf.args["li_op/tau"].ndim == 0
    assert vf.args["li_op/I_ext"].shape == (4,)


def test_coupling_dtype_bf16():
    """Reduced-precision coupling storage: bf16 weights, f32 accumulation."""
    n = 8
    rng = np.random.default_rng(9)
    W = rng.normal(size=(n, n)) * 0.1
    vf32 = lower("rectipy_tpu.models.rate_neurons.leaky_integrator.tanh", weights=W,
                 source_var="tanh_op/r", target_var="li_op/r_in", dtype=jnp.float32)
    vfb = lower("rectipy_tpu.models.rate_neurons.leaky_integrator.tanh", weights=W,
                source_var="tanh_op/r", target_var="li_op/r_in", dtype=jnp.float32,
                coupling_dtype=jnp.bfloat16)
    assert vfb.args["weights"].dtype == jnp.bfloat16
    y = jnp.asarray(rng.normal(size=(n,)), dtype=jnp.float32)
    d32 = np.asarray(vf32.func(0.0, y, vf32.args), dtype=np.float64)
    db = np.asarray(vfb.func(0.0, y, vfb.args), dtype=np.float64)
    assert vfb.func(0.0, y, vfb.args).dtype == jnp.float32  # accumulation stays f32
    np.testing.assert_allclose(db, d32, rtol=2e-2, atol=2e-2)


def test_coupling_dtype_int8():
    """int8 quantized coupling: per-row weight scales + dynamic activation
    scale, int32 accumulation; dynamics approximate f32 to quantization noise."""
    n = 16
    rng = np.random.default_rng(10)
    W = rng.normal(size=(n, n)) * 0.2
    kw = dict(weights=W, source_var="tanh_op/r", target_var="li_op/r_in",
              dtype=jnp.float32)
    vf32 = lower("rectipy_tpu.models.rate_neurons.leaky_integrator.tanh", **kw)
    vfq = lower("rectipy_tpu.models.rate_neurons.leaky_integrator.tanh",
                coupling_dtype=jnp.int8, **kw)
    assert vfq.args["weights"].dtype == jnp.int8
    assert "weights__scale" in vfq.args
    y = jnp.asarray(rng.normal(size=(n,)), dtype=jnp.float32)
    d32 = np.asarray(vf32.func(0.0, y, vf32.args), dtype=np.float64)
    dq = np.asarray(vfq.func(0.0, y, vfq.args), dtype=np.float64)
    # ~1% relative error from 8-bit weights+activations
    denom = np.abs(d32).max()
    assert np.abs(dq - d32).max() / denom < 0.05
    # trajectory stays qualitatively identical over 200 steps
    dt = 1e-2

    def traj(vf):
        yy = y
        for _ in range(200):
            yy = yy + dt * vf.func(0.0, yy, vf.args)
        return np.asarray(yy)

    t32, tq = traj(vf32), traj(vfq)
    assert np.corrcoef(t32, tq)[0, 1] > 0.999


def test_int8_coupling_gradients_flow_ste():
    """BPTT through int8 coupling uses a straight-through estimator: the
    gradient wrt upstream activations matches the dequantized-linear path."""
    import jax

    n = 8
    rng = np.random.default_rng(11)
    W = rng.normal(size=(n, n)) * 0.3
    vfq = lower("rectipy_tpu.models.rate_neurons.leaky_integrator.tanh", weights=W,
                source_var="tanh_op/r", target_var="li_op/r_in", dtype=jnp.float32,
                coupling_dtype=jnp.int8)
    y = jnp.asarray(rng.normal(size=(n,)), dtype=jnp.float32)

    def loss(y):
        return jnp.sum(vfq.func(0.0, y, vfq.args) ** 2)

    g = jax.grad(loss)(y)
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.abs(g).max()) > 0, "gradient vanished through int8 coupling"

    # training the quantized weights directly is rejected with guidance
    from rectipy_tpu.nodes import RateNet

    with pytest.raises(ValueError):
        RateNet.from_pyrates(
            "rectipy_tpu.models.rate_neurons.leaky_integrator.tanh", weights=W,
            source_var="tanh_op/r", target_var="li_op/r_in", input_var="li_op/I_ext",
            output_var="li_op/v", coupling_dtype="int8", train_params=["weights"])


def test_coupling_bfloat16_master_trains_f32():
    """bfloat16_master: f32 master weights (trainable), bf16 matvec; gradients
    reach the f32 master and the forward approximates f32."""
    import jax

    n = 8
    rng = np.random.default_rng(12)
    W = rng.normal(size=(n, n)) * 0.2
    vf = lower("rectipy_tpu.models.rate_neurons.leaky_integrator.tanh", weights=W,
               source_var="tanh_op/r", target_var="li_op/r_in", dtype=jnp.float32,
               coupling_dtype="bfloat16_master")
    assert vf.args["weights"].dtype == jnp.float32  # master stays f32
    y = jnp.asarray(rng.normal(size=(n,)), dtype=jnp.float32)

    def loss(w):
        a = dict(vf.args)
        a["weights"] = w
        return jnp.sum(vf.func(0.0, y, a) ** 2)

    g = jax.grad(loss)(vf.args["weights"])
    assert g.dtype == jnp.float32 and float(jnp.abs(g).max()) > 0
    # forward close to f32
    vf32 = lower("rectipy_tpu.models.rate_neurons.leaky_integrator.tanh", weights=W,
                 source_var="tanh_op/r", target_var="li_op/r_in", dtype=jnp.float32)
    d1 = np.asarray(vf.func(0.0, y, vf.args), dtype=np.float64)
    d2 = np.asarray(vf32.func(0.0, y, vf32.args), dtype=np.float64)
    np.testing.assert_allclose(d1, d2, rtol=3e-2, atol=3e-2)


def test_parser_edge_cases(tmp_path):
    """remove:, d/dt syntax, ** power, scientific literals, cross-file operator
    references inside node templates, explicit file/name template loading."""
    yaml_body = """
base_op:
  base: OperatorTemplate
  equations:
    - "v' = -v/tau + I_ext"
    - "w' = -w/tau"
  variables:
    v: output(0.5)
    w: variable(1.0)
    I_ext: input(0.0)
    tau: 2.0

child_op:
  base: base_op
  equations:
    remove:
      - "w' = -w/tau"
    add:
      - "d/dt * u = -u*2.0e-1 + v**2"
  variables:
    u: variable(0.0)

cross_op:
  base: rectipy_tpu.models.rate_neurons.leaky_integrator.tanh_op

custom:
  base: NodeTemplate
  operators:
    - child_op
    - cross_op
"""
    p = tmp_path / "custom.yaml"
    p.write_text(yaml_body)
    from rectipy_tpu.dsl.parser import _TemplateFile

    node = _TemplateFile.load(str(p)).get("custom")
    child = node.operators[0]
    eqs = " | ".join(child.equations)
    assert "w'" not in eqs                      # remove: applied
    assert "u" in child.variables               # add: applied
    assert node.operators[1].name == "cross_op"  # cross-file base resolved

    vf = lower(node, n=3, dtype=jnp.float64)
    # state order: v (eq order), then u; w removed so not a state
    assert set(vf.var_map) >= {"child_op/v", "child_op/u"}
    assert "child_op/w" not in vf.var_map
    y = jnp.asarray(np.arange(6, dtype=np.float64))
    dy = np.asarray(vf.func(0.0, y, vf.args))
    v, u = np.arange(3.0), np.arange(3.0, 6.0)
    np.testing.assert_allclose(dy[:3], -v / 2.0)             # dv
    np.testing.assert_allclose(dy[3:], -u * 0.2 + v ** 2)    # du: d/dt syntax + ** + 2.0e-1
    # chained op: tanh_op input v wired from child_op's output v
    r = vf.read_var("cross_op/r", y, vf.args)
    np.testing.assert_allclose(np.asarray(r), np.tanh(v))


def test_expression_fuzz_against_numpy():
    """Randomized expression trees: DSL evaluator == direct numpy interpretation."""
    rng = np.random.default_rng(42)
    VARS = {"a": rng.uniform(0.2, 1.5, 5), "b": rng.uniform(-1.0, 1.0, 5), "c": 0.7}
    FUNCS = {"tanh": np.tanh, "sin": np.sin, "cos": np.cos, "abs": np.abs,
             "sigmoid": lambda x: 1 / (1 + np.exp(-x)), "mean": lambda x: np.mean(x)}

    def gen(depth):
        r = rng.random()
        if depth == 0 or r < 0.25:
            choice = rng.random()
            if choice < 0.4:
                return str(np.round(rng.uniform(0.1, 3.0), 3))
            return rng.choice(list(VARS))
        if r < 0.45:
            fname = rng.choice(list(FUNCS))
            return f"{fname}({gen(depth - 1)})"
        op = rng.choice(["+", "-", "*", "/", "^"])
        left, right = gen(depth - 1), gen(depth - 1)
        if op == "/":
            right = f"(abs({right}) + 1.5)"  # keep denominators away from 0
        if op == "^":
            return f"(abs({left}) + 0.5) ^ {rng.integers(1, 4)}"
        return f"({left} {op} {right})"

    def np_eval(ast):
        tag = ast[0]
        if tag == "num":
            return ast[1]
        if tag == "var":
            return VARS[ast[1]]
        if tag == "neg":
            return -np_eval(ast[1])
        if tag == "bin":
            op, l, r = ast[1], np_eval(ast[2]), np_eval(ast[3])
            return {"+": np.add, "-": np.subtract, "*": np.multiply,
                    "/": np.divide, "^": np.power}[op](l, r)
        if tag == "call":
            return FUNCS[ast[1]](*[np_eval(x) for x in ast[2]])
        raise AssertionError(ast)

    env = {k: jnp.asarray(v) if isinstance(v, np.ndarray) else v for k, v in VARS.items()}
    for _ in range(200):
        expr = gen(4)
        ast = parse(expr)
        ours = np.asarray(evaluate(ast, env), dtype=np.float64)
        ref = np.asarray(np_eval(ast), dtype=np.float64)
        np.testing.assert_allclose(ours, np.broadcast_to(ref, ours.shape) if ours.shape else ref,
                                   rtol=1e-6, atol=1e-6, err_msg=expr)


def test_int8_master_run_prep_hoisted_bit_identical():
    """run()/inference hoists the int8_master requantization out of the scan
    (network._prep_params -> vf.prep_args): the prepped matvec must be
    BIT-identical to the per-step custom-VJP matvec it replaces."""
    import jax

    from rectipy_tpu import Network

    n = 32
    rng = np.random.default_rng(21)
    W = rng.normal(size=(n, n)) / np.sqrt(n)
    inp = rng.normal(size=(40, 1)).astype(np.float32)

    def build():
        net = Network(1e-2)
        net.add_diffeq_node(
            "t", "rectipy_tpu.models.rate_neurons.leaky_integrator.tanh",
            weights=W, source_var="tanh_op/r", target_var="li_op/r_in",
            input_var="li_op/I_ext", output_var="li_op/v",
            coupling_dtype="int8_master")
        return net

    net = build()
    assert net.get_node("t")._vf.prep_args is not None
    out = net.run(inp, record_output=True, verbose=False).to_numpy("out")

    # manual per-step loop through the UNPREPPED step (custom-VJP matvec)
    node = build().get_node("t")
    step = jax.jit(node.make_step())
    y, args = node.init_state(), dict(node.args)
    ref = []
    for t in range(inp.shape[0]):
        y, o = step(y, args, jnp.broadcast_to(jnp.asarray(inp[t]), (n,)))
        ref.append(np.asarray(o))
    np.testing.assert_array_equal(out, np.stack(ref))


def test_int8_dense_fan_in_overflow_guard(monkeypatch):
    """Dense int8/int8_master couplings above the int32-safe fan-in bound
    fail loudly at lowering time (ops/quant.INT8_DOT_MAX_FAN_IN)."""
    import rectipy_tpu.ops.quant as quant

    monkeypatch.setattr(quant, "INT8_DOT_MAX_FAN_IN", 10)
    n = 16
    W = np.eye(n)
    kw = dict(weights=W, source_var="tanh_op/r", target_var="li_op/r_in")
    for cd in (jnp.int8, "int8_master"):
        with pytest.raises(ValueError, match="overflow"):
            lower("rectipy_tpu.models.rate_neurons.leaky_integrator.tanh",
                  coupling_dtype=cd, **kw)


def test_coupling_dtype_int4():
    """Frozen int4 coupling (coupling_dtype='int4'): per-row [-7, 7] weights
    stored as an int8 CARRIER (int4 cannot cross staging boundaries on the
    axon relay -- ops/quant.py int4 section), int4 x int8 matvec, dynamics
    approximate f32 to 4-bit quantization noise."""
    n = 16
    rng = np.random.default_rng(30)
    W = rng.normal(size=(n, n)) * 0.2
    kw = dict(weights=W, source_var="tanh_op/r", target_var="li_op/r_in",
              dtype=jnp.float32)
    import jax

    vf32 = lower("rectipy_tpu.models.rate_neurons.leaky_integrator.tanh", **kw)
    vfq = lower("rectipy_tpu.models.rate_neurons.leaky_integrator.tanh",
                coupling_dtype="int4", **kw)
    # int8 carrier holding [-7, 7] + per-row scale; prep casts to int4
    assert vfq.args["weights"].dtype == jnp.int8
    assert int(np.abs(np.asarray(vfq.args["weights"])).max()) <= 7
    assert "weights__scale" in vfq.args
    assert vfq.prep_args is not None
    prepped = vfq.prep_args(vfq.args)
    assert prepped["weights__q4"].dtype == jnp.int4

    y = jnp.asarray(rng.normal(size=(n,)), dtype=jnp.float32)
    d32 = np.asarray(vf32.func(0.0, y, vf32.args), dtype=np.float64)
    dq = np.asarray(vfq.func(0.0, y, vfq.args), dtype=np.float64)  # in-body cast fallback
    dqp = np.asarray(vfq.func(0.0, y, prepped), dtype=np.float64)  # prepped path
    np.testing.assert_array_equal(dq, dqp)  # same numerics either way
    denom = np.abs(d32).max()
    assert np.abs(dq - d32).max() / denom < 0.15  # 4-bit weights: ~7% noise

    # trajectory stays qualitatively identical over 200 steps
    dt = 1e-2

    def traj(vf, a):
        yy = y
        for _ in range(200):
            yy = yy + dt * vf.func(0.0, yy, a)
        return np.asarray(yy)

    t32, tq = traj(vf32, vf32.args), traj(vfq, prepped)
    assert np.corrcoef(t32, tq)[0, 1] > 0.99

    # STE: gradients flow through the frozen int4 coupling to activations
    def loss(y):
        return jnp.sum(vfq.func(0.0, y, prepped) ** 2)

    g = jax.grad(loss)(y)
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.abs(g).max()) > 0, "gradient vanished through int4 coupling"

    # training the frozen-quantized weights directly is rejected with guidance
    from rectipy_tpu.nodes import RateNet

    with pytest.raises(ValueError, match="quantized"):
        RateNet.from_pyrates(
            "rectipy_tpu.models.rate_neurons.leaky_integrator.tanh", weights=W,
            source_var="tanh_op/r", target_var="li_op/r_in", input_var="li_op/I_ext",
            output_var="li_op/v", coupling_dtype="int4", train_params=["weights"])

    # block-sparse int4 is rejected with guidance (dense-only)
    from rectipy_tpu.ops.sparse import BlockSparseCoupling

    bs = 8
    blocks = rng.normal(size=(2, 1, bs, bs)).astype(np.float32)
    cols = np.asarray([[0], [1]], dtype=np.int32)
    Wbs = BlockSparseCoupling(blocks, cols)
    with pytest.raises(NotImplementedError, match="dense-only"):
        lower("rectipy_tpu.models.rate_neurons.leaky_integrator.tanh",
              weights=Wbs, source_var="tanh_op/r", target_var="li_op/r_in",
              coupling_dtype="int4")


def test_int4_master_run_prep_hoisted_bit_identical():
    """run()/inference hoists the int4_master quantization + int4 cast out of
    the scan (network._prep_params -> vf.prep_args): the prepped matvec must
    be BIT-identical to the per-step custom-VJP matvec it replaces, and the
    frozen-int4 network must produce the SAME trajectory (same quantization
    numerics, ops/quant.quantize_rows_i4)."""
    import jax

    from rectipy_tpu import Network

    n = 32
    rng = np.random.default_rng(31)
    W = rng.normal(size=(n, n)) / np.sqrt(n)
    inp = rng.normal(size=(40, 1)).astype(np.float32)

    def build(cd):
        net = Network(1e-2)
        net.add_diffeq_node(
            "t", "rectipy_tpu.models.rate_neurons.leaky_integrator.tanh",
            weights=W, source_var="tanh_op/r", target_var="li_op/r_in",
            input_var="li_op/I_ext", output_var="li_op/v",
            coupling_dtype=cd)
        return net

    net = build("int4_master")
    assert net.get_node("t")._vf.prep_args is not None
    out = net.run(inp, record_output=True, verbose=False).to_numpy("out")

    # manual per-step loop through the UNPREPPED step (custom-VJP matvec)
    node = build("int4_master").get_node("t")
    step = jax.jit(node.make_step())
    y, args = node.init_state(), dict(node.args)
    ref = []
    for t in range(inp.shape[0]):
        y, o = step(y, args, jnp.broadcast_to(jnp.asarray(inp[t]), (n,)))
        ref.append(np.asarray(o))
    np.testing.assert_array_equal(out, np.stack(ref))

    # frozen int4 network: same trajectory up to cross-program f32
    # reordering (the STE formulation computes the same integers, but the
    # two jitted programs fuse the surrounding f32 dynamics differently)
    out_frozen = build("int4").run(inp, record_output=True,
                                   verbose=False).to_numpy("out")
    np.testing.assert_allclose(out_frozen, out, rtol=1e-5, atol=1e-7)


def test_int4_dense_fan_in_overflow_guard():
    """int4 x int8 accumulates in int32: fan-in >= INT4_DOT_MAX_FAN_IN is
    rejected loudly at lowering time (7 * 127 * fan_in < 2^31)."""
    from rectipy_tpu.ops import quant

    assert quant.INT4_DOT_MAX_FAN_IN == (2**31 - 1) // (7 * 127)
    # the bound is ~18x looser than int8's -- verify the guard wiring with a
    # monkeypatched threshold rather than a 2.4-million-column matrix
    import unittest.mock as um

    n = 32
    W = np.ones((n, n), dtype=np.float32) * 0.1
    kw = dict(weights=W, source_var="tanh_op/r", target_var="li_op/r_in")
    with um.patch.object(quant, "INT4_DOT_MAX_FAN_IN", n):
        for cd in ("int4", "int4_master"):
            with pytest.raises(ValueError, match="overflow"):
                lower("rectipy_tpu.models.rate_neurons.leaky_integrator.tanh",
                      coupling_dtype=cd, **kw)
