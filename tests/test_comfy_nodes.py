"""Drop-in ComfyUI node surface (comfy_nodes.py) vs the reference plugin.

The reference registers four nodes (ref: nodes.py:335-347); these tests pin
our adapter to that exact surface (names, FUNCTION, RETURN_TYPES/NAMES,
CATEGORY, input coercion rules) and run the renderer nodes end-to-end on
tiny pipelines with torch IMAGE tensors, the ComfyUI calling convention.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import diffusionrenderer_tpu  # noqa: E402
from diffusionrenderer_tpu import api, comfy_nodes  # noqa: E402
from diffusionrenderer_tpu.comfy_nodes import (  # noqa: E402
    NODE_CLASS_MAPPINGS,
    Cosmos1ForwardRenderer,
    Cosmos1InverseRenderer,
    LoadDiffusionRendererModel,
    LoadHDRImage,
    _coerce_5d_torch,
)

from test_pipeline import make_pipeline  # noqa: E402


@pytest.fixture(scope="module")
def inv_pipe():
    return make_pipeline("inverse")


@pytest.fixture(scope="module")
def fwd_pipe():
    return make_pipeline("forward")


class TestPluginSurface:
    def test_node_mapping_keys_match_reference(self):
        # ref: nodes.py:335-340
        assert set(NODE_CLASS_MAPPINGS) == {
            "LoadDiffusionRendererModel",
            "Cosmos1InverseRenderer",
            "Cosmos1ForwardRenderer",
            "LoadHDRImage",
        }

    def test_package_exposes_mappings_lazily(self):
        # ComfyUI reads these off the package root (ref: __init__.py:1-3).
        assert diffusionrenderer_tpu.NODE_CLASS_MAPPINGS is NODE_CLASS_MAPPINGS
        assert set(diffusionrenderer_tpu.NODE_DISPLAY_NAME_MAPPINGS) == set(
            NODE_CLASS_MAPPINGS
        )
        with pytest.raises(AttributeError):
            diffusionrenderer_tpu.NOT_A_THING

    def test_node_contracts_match_reference(self):
        # ref: nodes.py:70-73, 144-147, 240-243, 320-323
        assert LoadDiffusionRendererModel.RETURN_TYPES == (
            "DIFFUSION_RENDERER_PIPELINE",)
        assert LoadDiffusionRendererModel.FUNCTION == "load_pipeline"
        assert Cosmos1InverseRenderer.RETURN_TYPES == ("IMAGE",) * 5
        assert Cosmos1InverseRenderer.RETURN_NAMES == (
            "base_color", "metallic", "roughness", "normal", "depth")
        assert Cosmos1InverseRenderer.FUNCTION == "run_inverse_pass"
        assert Cosmos1ForwardRenderer.RETURN_TYPES == ("IMAGE",)
        assert Cosmos1ForwardRenderer.FUNCTION == "run_forward_pass"
        assert LoadHDRImage.RETURN_TYPES == ("IMAGE",)
        assert LoadHDRImage.FUNCTION == "load_hdr"
        for cls in NODE_CLASS_MAPPINGS.values():
            assert cls.CATEGORY == "Cosmos1"
            assert isinstance(cls.INPUT_TYPES(), dict)
            assert "required" in cls.INPUT_TYPES()

    def test_input_types_match_reference_fields(self):
        # ref: nodes.py:132-142, 222-239
        inv = Cosmos1InverseRenderer.INPUT_TYPES()
        assert set(inv["required"]) == {"pipeline", "image"}
        assert set(inv["optional"]) == {"guidance", "seed"}
        fwd = Cosmos1ForwardRenderer.INPUT_TYPES()
        assert set(fwd["required"]) == {
            "pipeline", "depth", "normal", "roughness", "metallic",
            "base_color", "env_map",
        }
        assert {"guidance", "seed", "env_format", "env_brightness",
                "env_flip_horizontal", "env_rotation"} <= set(fwd["optional"])
        assert fwd["optional"]["env_rotation"][1]["default"] == 180.0


REFERENCE_NODES = "/root/reference/nodes.py"


def _reference_node_surface():
    """Extract each reference node's declared surface by AST — the reference
    imports comfy/folder_paths (absent here), so it cannot be imported; its
    class-level declarations are still the ground truth to pin against."""
    import ast

    with open(REFERENCE_NODES) as f:
        tree = ast.parse(f.read())
    surface = {}
    for node in ast.walk(tree):
        if not isinstance(node, ast.ClassDef):
            continue
        info = {}
        for item in node.body:
            if isinstance(item, ast.FunctionDef) and item.name == "INPUT_TYPES":
                ret = item.body[-1]
                assert isinstance(ret, ast.Return)
                sections = {}
                for k, v in zip(ret.value.keys, ret.value.values):
                    if isinstance(v, ast.Dict):
                        sections[ast.literal_eval(k)] = [
                            ast.literal_eval(kk) for kk in v.keys
                        ]
                info["inputs"] = sections
            elif isinstance(item, ast.Assign):
                name = item.targets[0].id
                if name in ("RETURN_TYPES", "RETURN_NAMES", "FUNCTION",
                            "CATEGORY"):
                    info[name] = ast.literal_eval(item.value)
        if "inputs" in info:
            surface[node.name] = info
    return surface


@pytest.mark.skipif(not __import__("os").path.exists(REFERENCE_NODES),
                    reason="reference checkout not available")
class TestReferenceSurfaceParity:
    """Pin the adapter to the reference's ACTUAL declarations (parsed from
    /root/reference/nodes.py), not to a restated copy of them."""

    def test_every_reference_node_is_provided(self):
        ref = _reference_node_surface()
        assert set(ref) <= set(NODE_CLASS_MAPPINGS)

    def test_declared_surface_matches(self):
        ref = _reference_node_surface()
        for name, info in ref.items():
            ours = NODE_CLASS_MAPPINGS[name]
            our_inputs = ours.INPUT_TYPES()
            # Required fields must match EXACTLY: a saved workflow graph
            # wires links/widgets by these names.
            assert sorted(our_inputs["required"]) == sorted(
                info["inputs"]["required"]), name
            # Every reference optional must exist here (extras with
            # defaults — e.g. quant_mode — are graph-compatible additions).
            for opt in info["inputs"].get("optional", ()):
                assert opt in our_inputs.get("optional", {}), (name, opt)
            assert tuple(ours.RETURN_TYPES) == tuple(info["RETURN_TYPES"]), name
            if "RETURN_NAMES" in info:
                assert tuple(ours.RETURN_NAMES) == tuple(
                    info["RETURN_NAMES"]), name
            assert ours.FUNCTION == info["FUNCTION"], name
            assert ours.CATEGORY == info["CATEGORY"], name

    def test_function_signatures_accept_reference_kwargs(self):
        """ComfyUI calls FUNCTION with every declared input as a kwarg."""
        import inspect

        ref = _reference_node_surface()
        for name, info in ref.items():
            cls = NODE_CLASS_MAPPINGS[name]
            fn = getattr(cls, cls.FUNCTION)
            params = inspect.signature(fn).parameters
            declared = (info["inputs"]["required"]
                        + info["inputs"].get("optional", []))
            for field in declared:
                assert field in params, (name, field)


class TestInputCoercion:
    """ref: nodes.py:156-179."""

    def test_3d_and_4d_and_5d(self):
        t3 = torch.zeros(4, 6, 3)
        assert _coerce_5d_torch(t3, "x").shape == (1, 1, 4, 6, 3)
        t4 = torch.zeros(2, 4, 6, 3)
        assert _coerce_5d_torch(t4, "x").shape == (2, 1, 4, 6, 3)
        t5 = torch.zeros(2, 3, 4, 6, 3)
        assert _coerce_5d_torch(t5, "x") is t5

    def test_list_stacks(self):
        out = _coerce_5d_torch([torch.zeros(2, 4, 6, 3)] * 3, "x")
        assert out.shape == (3, 2, 4, 6, 3)

    def test_ragged_list_takes_first(self):
        out = _coerce_5d_torch(
            [torch.ones(1, 4, 6, 3), torch.zeros(1, 8, 6, 3)], "x")
        assert out.shape == (1, 1, 4, 6, 3)
        assert torch.all(out == 1)

    def test_rejects_bad_rank_and_type(self):
        with pytest.raises(ValueError, match="dimension"):
            _coerce_5d_torch(torch.zeros(4, 6), "x")
        with pytest.raises(TypeError, match="type"):
            _coerce_5d_torch("nope", "x")


class TestInverseNode:
    def test_end_to_end_matches_api(self, inv_pipe):
        rng = np.random.default_rng(0)
        img = rng.uniform(size=(1, 16, 16, 3)).astype(np.float32)
        node_out = Cosmos1InverseRenderer().run_inverse_pass(
            inv_pipe, torch.from_numpy(img), guidance=0.0, seed=7)
        assert len(node_out) == 5
        for t in node_out:
            assert isinstance(t, torch.Tensor)
            assert t.shape == (1, 16, 16, 3)
            assert t.dtype == torch.float32
            v = t.numpy()
            assert np.isfinite(v).all() and v.min() >= 0 and v.max() <= 1
        ref = api.inverse_render(inv_pipe, img, guidance=0.0, seed=7)
        order = Cosmos1InverseRenderer.RETURN_NAMES
        key = {"base_color": "basecolor"}
        for name, t in zip(order, node_out):
            np.testing.assert_array_equal(
                t.numpy(), ref[key.get(name, name)])


class TestForwardNode:
    def test_end_to_end(self, fwd_pipe):
        rng = np.random.default_rng(1)
        g = {
            k: torch.from_numpy(
                rng.uniform(size=(1, 16, 16, 3)).astype(np.float32))
            for k in ("depth", "normal", "roughness", "metallic",
                      "base_color")
        }
        env = torch.from_numpy(
            (rng.uniform(size=(1, 8, 16, 3)) * 4).astype(np.float32))
        (out,) = Cosmos1ForwardRenderer().run_forward_pass(
            fwd_pipe, env_map=env, guidance=0.0, seed=3,
            env_format="proj", **g)
        assert isinstance(out, torch.Tensor)
        assert out.shape == (1, 16, 16, 3)
        v = out.numpy()
        assert np.isfinite(v).all() and v.min() >= 0 and v.max() <= 1

    def test_ball_mode(self, fwd_pipe):
        rng = np.random.default_rng(2)
        g = {
            k: torch.from_numpy(
                rng.uniform(size=(1, 16, 16, 3)).astype(np.float32))
            for k in ("depth", "normal", "roughness", "metallic",
                      "base_color")
        }
        env = torch.from_numpy(
            (rng.uniform(size=(1, 16, 16, 3)) * 2).astype(np.float32))
        (out,) = Cosmos1ForwardRenderer().run_forward_pass(
            fwd_pipe, env_map=env, env_format="ball", **g)
        assert out.shape == (1, 16, 16, 3)


class TestLoadHDRNode:
    def test_loads_hdr_as_image_tensor(self, tmp_path):
        from diffusionrenderer_tpu.native import rgbe

        img = np.abs(np.random.default_rng(3).standard_normal(
            (8, 16, 3))).astype(np.float32) * 10
        path = str(tmp_path / "env.hdr")
        rgbe.save_hdr(path, img)
        (out,) = LoadHDRImage().load_hdr(path)
        assert isinstance(out, torch.Tensor)
        assert out.shape == (1, 8, 16, 3)
        # HDR: values may exceed 1 (ref: nodes.py:312-332).
        assert float(out.max()) > 1.0


class TestExampleWorkflow:
    def test_workflow_json_wires_valid_nodes_and_inputs(self):
        """docs/example_workflow.json must only reference node classes and
        input fields this package actually declares (LoadImage/SaveImage are
        ComfyUI built-ins), and every link must point at an existing node's
        existing output slot."""
        import json
        import os

        path = os.path.join(os.path.dirname(__file__), "..", "docs",
                            "example_workflow.json")
        with open(path) as f:
            wf = json.load(f)
        nodes = {k: v for k, v in wf.items() if isinstance(v, dict)}
        builtin = {"LoadImage", "SaveImage"}
        for nid, spec in nodes.items():
            ct = spec["class_type"]
            if ct in builtin:
                continue
            cls = NODE_CLASS_MAPPINGS[ct]
            declared = cls.INPUT_TYPES()
            fields = set(declared["required"]) | set(
                declared.get("optional", {}))
            for field, value in spec["inputs"].items():
                assert field in fields, (ct, field)
                if isinstance(value, list):  # a link: [node_id, slot]
                    src_id, slot = value
                    src = nodes[src_id]
                    if src["class_type"] not in builtin:
                        src_cls = NODE_CLASS_MAPPINGS[src["class_type"]]
                        assert slot < len(src_cls.RETURN_TYPES), (ct, field)


class TestLoaderNode:
    def test_standalone_input_is_a_path(self):
        spec = LoadDiffusionRendererModel.INPUT_TYPES()
        if not comfy_nodes._HAS_COMFY:
            assert spec["required"]["model"][0] == "STRING"
        assert set(spec["optional"]) == {"quant_mode", "vae_path"}

    def test_kwarg_plumbing(self, monkeypatch):
        """The loader resolves quant_mode into load_pipeline kwargs; paths
        pass through untouched standalone (full-checkpoint load is covered
        by test_cli/test_checkpoint_native on tiny weights)."""
        seen = {}

        def fake_load_pipeline(**kw):
            seen.update(kw)
            return "PIPE"

        monkeypatch.setattr(comfy_nodes.api, "load_pipeline",
                            fake_load_pipeline)
        (pipe,) = LoadDiffusionRendererModel().load_pipeline(
            "/tmp/dit.safetensors", quant_mode="w8a8_g128_keepres")
        assert pipe == "PIPE"
        assert seen["dit_checkpoint"] == "/tmp/dit.safetensors"
        assert seen["vae_checkpoint"] is None
        assert seen["model_type"] == "inverse"
        assert (seen["guidance"], seen["num_steps"], seen["seed"]) == (
            0.0, 15, 42)  # ref: nodes.py:123-125
        assert seen["quantize_int8"] and seen["act_quant"]
        assert seen["quant_group_size"] == 128
        assert seen["quant_keep_bf16"] == ("w2", "wo")

    def test_bf16_mode_passes_no_quant_kwargs(self, monkeypatch):
        seen = {}
        monkeypatch.setattr(comfy_nodes.api, "load_pipeline",
                            lambda **kw: seen.update(kw) or "PIPE")
        LoadDiffusionRendererModel().load_pipeline(
            "/tmp/dit", quant_mode="bf16", vae_path="/tmp/vae")
        assert "quantize_int8" not in seen
        assert seen["vae_checkpoint"] == "/tmp/vae"

    def test_all_quant_modes_parse(self):
        from diffusionrenderer_tpu.models.quant import parse_quant_mode

        for m in comfy_nodes.QUANT_MODES:
            if m != "bf16":
                parse_quant_mode(m)
