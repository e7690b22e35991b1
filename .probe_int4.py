import time
import jax, jax.numpy as jnp
import numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from autostyle_tts_tpu.pipeline import Engine
from autostyle_tts_tpu.pipeline.engine import _bucket, TEXT_BUCKETS, TOKEN_BUCKETS
from autostyle_tts_tpu.models import frontend, token_lm
from autostyle_tts_tpu.utils.config import Config

cfg = Config(); cfg.quantize_lm_int8 = True; cfg.quantize_lm_kv_int8 = True
engine = Engine(cfg, seed=0)
sr = cfg.audio.prompt_sample_rate
wav = (0.4*np.sin(2*np.pi*180*np.arange(3*sr)/sr)).astype(np.float32)
sty, tim = engine.prompt_features([wav, wav])
text = "That is the most ridiculous thing I have ever heard in my life, truly."
style_text = "A short style transcript for the prompt."
tl = cfg.token_lm
full = (style_text + " " + text).strip()
tok = engine.text_tokenizer
text_ids, text_lens = frontend.encode_batch([full], None,
    width=_bucket(len(frontend.encode(full, tokenizer=tok)), TEXT_BUCKETS), tokenizer=tok)
sty_w = _bucket(len(sty.tokens), TOKEN_BUCKETS)
sarr = np.zeros((1, sty_w), np.int32); sarr[0,:len(sty.tokens)] = sty.tokens
d_text = jnp.asarray(text_ids); d_tl = jnp.asarray(text_lens)
d_sty = jnp.asarray(sarr); d_sl = jnp.asarray(np.asarray([len(sty.tokens)], np.int32))
d_spk = jnp.asarray(tim.spk[None])
key = jax.random.PRNGKey(42)

def p50(f, n=7):
    f()
    ts = []
    for _ in range(n):
        t0 = time.perf_counter(); f(); ts.append(time.perf_counter()-t0)
    return round(sorted(ts)[n//2]*1e3, 2)

for bits in (8, 4):
    mp = token_lm.mega_decode_params(engine.params.token_lm, tl, bits=bits)
    for mn in (8, 128):
        def lm():
            g = token_lm.generate_speech_from_ids(
                engine.params.token_lm, tl, d_text, d_tl, d_sty, d_sl, d_spk, key,
                max_new_tokens=mn, kv_int8=True, fused=True, decode_params=mp)
            np.asarray(g.lengths)
        print(f"bits{bits}_max_new_{mn}_ms:", p50(lm))
# token agreement int8 vs int4 (greedy)
from autostyle_tts_tpu.ops.sampling import SamplerConfig
outs = {}
for bits in (8, 4):
    mp = token_lm.mega_decode_params(engine.params.token_lm, tl, bits=bits)
    g = token_lm.generate_speech_from_ids(
        engine.params.token_lm, tl, d_text, d_tl, d_sty, d_sl, d_spk, key,
        max_new_tokens=128, kv_int8=True, fused=True, decode_params=mp,
        sampler=SamplerConfig(greedy=True))
    outs[bits] = np.asarray(g.tokens)[0]
agree = float((outs[8] == outs[4]).mean())
print("greedy_token_agreement_int8_vs_int4:", round(agree, 3))
