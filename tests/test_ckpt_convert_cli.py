"""Round-trip the converter CLI with a tiny local HF checkpoint."""
import os, json, subprocess, sys
import numpy as np

def test_ckpt_convert_roundtrip(tmp_path):
    import torch
    from transformers import Qwen2Config, Qwen2ForCausalLM

    hf_cfg = Qwen2Config(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=2,
        max_position_embeddings=64, rope_theta=1e4, tie_word_embeddings=True,
    )
    torch.manual_seed(0)
    model = Qwen2ForCausalLM(hf_cfg)
    hf_dir = tmp_path / "hf"
    model.save_pretrained(hf_dir)

    from rlinf_tpu.toolkits.ckpt_convert import main
    out = tmp_path / "orbax"
    rc = main(["import", "--hf", str(hf_dir), "--out", str(out),
               "--dtype", "float32"])
    assert rc == 0
    assert os.path.exists(out / "global_step_0" / "_DONE")

    # export back and compare a tensor
    cfgfile = tmp_path / "cfg.yaml"
    cfgfile.write_text(
        "model:\n  vocab_size: 128\n  hidden_size: 32\n"
        "  intermediate_size: 64\n  num_layers: 2\n  num_heads: 2\n"
        "  num_kv_heads: 2\n  max_seq_len: 256\n  dtype: float32\n"
        "  tie_word_embeddings: true\n  qkv_bias: true\n"
    )
    hf_out = tmp_path / "hf_out"
    rc = main(["export", "--ckpt", str(out), "--config", str(cfgfile),
               "--out", str(hf_out)])
    assert rc == 0
    from safetensors.numpy import load_file
    sd = load_file(hf_out / "model.safetensors")
    ref = model.state_dict()["model.embed_tokens.weight"].numpy()
    np.testing.assert_allclose(
        sd["model.embed_tokens.weight"], ref, rtol=1e-5, atol=1e-5)
