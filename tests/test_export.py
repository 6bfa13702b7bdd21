"""Export roundtrip: our pytree -> HF state dict -> our pytree preserves
weights exactly, and the exported state loads into the HF torch model."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from karanta_tpu.models.qwen25_vl.config import tiny_config
from karanta_tpu.models.qwen25_vl.exporting import (
    save_hf_checkpoint, to_hf_state_dict,
)
from karanta_tpu.models.qwen25_vl.loading import convert_state_dict
from karanta_tpu.models.qwen25_vl.model import init_params

CFG = tiny_config()


class TestExport:
    def test_roundtrip_identity(self):
        params = init_params(CFG, jax.random.PRNGKey(0), dtype=jnp.float32)
        state = to_hf_state_dict(params, CFG)
        back = convert_state_dict(state, CFG, dtype=jnp.float32)

        flat_a, _ = jax.tree_util.tree_flatten_with_path(params)
        flat_b, _ = jax.tree_util.tree_flatten_with_path(back)
        assert len(flat_a) == len(flat_b)
        for (path_a, leaf_a), (path_b, leaf_b) in zip(flat_a, flat_b):
            assert path_a == path_b
            np.testing.assert_allclose(
                np.asarray(leaf_a), np.asarray(leaf_b), atol=1e-6,
                err_msg=str(path_a))

    def test_loads_into_torch_model(self, tmp_path):
        torch = pytest.importorskip("torch")
        from transformers.models.qwen2_5_vl.configuration_qwen2_5_vl import (
            Qwen2_5_VLConfig,
        )
        from transformers.models.qwen2_5_vl.modeling_qwen2_5_vl import (
            Qwen2_5_VLForConditionalGeneration,
        )

        params = init_params(CFG, jax.random.PRNGKey(1), dtype=jnp.float32)
        out = save_hf_checkpoint(params, CFG, str(tmp_path / "export"))

        import json

        with open(f"{out}/config.json") as f:
            hf_cfg = Qwen2_5_VLConfig(**json.load(f))
        model = Qwen2_5_VLForConditionalGeneration(hf_cfg)

        from safetensors.torch import load_file

        state = load_file(f"{out}/model.safetensors")
        missing, unexpected = model.load_state_dict(state, strict=False)
        # rotary inv_freq buffers are derived, not stored
        real_missing = [k for k in missing if "inv_freq" not in k
                        and "rotary" not in k]
        assert not real_missing, real_missing
        assert not unexpected, unexpected
