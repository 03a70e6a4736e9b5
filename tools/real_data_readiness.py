"""Real-data readiness report: what is mounted, what is still blocked.

Round-3 verdict: every remaining capability gap is real-data/real-model
closure (FMA audio, all-MiniLM-L6-v2 weights, Whisper model, live lyrics
APIs), all environment-blocked.  The hooks for each are wired and
skip-marked; this tool is the one command that says exactly which of them
can close TODAY, so the day something mounts, closure starts with

    python tools/real_data_readiness.py

and the printed next-step command.  Exit code is always 0 — "blocked" is
the expected CI state, not a failure.
"""
from __future__ import annotations
import sys
from pathlib import Path

# Run as a script from anywhere: put the repo root on sys.path (the dev
# container's site-packages .pth is not guaranteed to exist).
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


import json
import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def check_audio_corpus(root: Path) -> dict:
    """FMA-small mp3 tree + the cleaned combined manifest (reference
    scripts 00-05 outputs; needed by `vae-hmc parity-check --manifest`)."""
    out = {"name": "FMA audio corpus", "ready": False}
    manifest = root / "data" / "fma_manifest_combined_text_only_clean.csv"
    ref_manifest = Path("/root/reference/data/"
                        "fma_manifest_combined_text_only_clean.csv")
    out["manifest"] = str(manifest) if manifest.exists() else (
        f"missing (reference copy exists: {ref_manifest.exists()})")
    audio_root = root / "data" / "fma_small"
    n_mp3 = len(list(audio_root.rglob("*.mp3"))) if audio_root.exists() else 0
    out["mp3_files"] = n_mp3
    out["ready"] = manifest.exists() and n_mp3 > 0
    out["next_step"] = (
        "python -m vae_hmc_tpu.cli parity-check "
        f"--manifest {manifest} --root {root}"
        if out["ready"] else
        "mount data/fma_small/**/*.mp3 + the cleaned manifest (or run the "
        "acquisition tier: vae-hmc download-fma && build-manifest && ...)")
    return out


def check_minilm(root: Path) -> dict:
    """Real all-MiniLM-L6-v2 checkpoint via VAE_HMC_MINILM_DIR (text.embed
    backend #1; reference scripts/11:85-93 embeds with the real model)."""
    out = {"name": "MiniLM real weights", "ready": False}
    mdir = os.environ.get("VAE_HMC_MINILM_DIR")
    out["env"] = mdir or "VAE_HMC_MINILM_DIR unset"
    if mdir and Path(mdir).is_dir():
        d = Path(mdir)
        has_weights = ((d / "pytorch_model.bin").exists()
                       or (d / "model.safetensors").exists())
        has_vocab = (d / "vocab.txt").exists()
        out["weights"] = has_weights
        out["vocab"] = has_vocab
        out["ready"] = has_weights and has_vocab
    out["next_step"] = (
        "pytest tests/test_text_minilm.py -k real -q  (golden vs "
        "sentence-transformers) then re-run bench.py — it auto-loads the dir"
        if out["ready"] else
        "mount an all-MiniLM-L6-v2 HF checkout (pytorch_model.bin|"
        "model.safetensors + vocab.txt) and export VAE_HMC_MINILM_DIR")
    return out


def check_whisper() -> dict:
    """openai-whisper 'turbo' (reference scripts/03:15); the acquisition
    stage takes any TranscribeFn, default_whisper_transcriber needs the
    package + model weights."""
    out = {"name": "Whisper real model", "ready": False}
    try:
        import whisper  # noqa: F401
        out["package"] = "installed"
        out["ready"] = True     # model weights download on first load
    except ImportError:
        out["package"] = "openai-whisper not installed"
    out["next_step"] = (
        "python -m vae_hmc_tpu.cli fetch-transcriptions --manifest "
        "data/fma_manifest_3k_6genres.csv --limit 3"
        if out["ready"] else
        "install openai-whisper (+ffmpeg) or pass a custom transcriber to "
        "pipelines.acquisition.fetch_transcriptions")
    return out


def check_lyrics_apis() -> dict:
    """Genius + LRCLIB live fetch (reference scripts/02): needs egress and
    a GENIUS_ACCESS_TOKEN."""
    out = {"name": "Live lyrics APIs", "ready": False}
    out["token"] = ("set" if os.environ.get("GENIUS_ACCESS_TOKEN")
                    else "GENIUS_ACCESS_TOKEN unset")
    try:
        import socket
        socket.create_connection(("api.genius.com", 443), timeout=3).close()
        out["egress"] = "reachable"
        out["ready"] = bool(os.environ.get("GENIUS_ACCESS_TOKEN"))
    except OSError:
        out["egress"] = "no egress"
    out["next_step"] = (
        "python -m vae_hmc_tpu.cli fetch-lyrics --manifest "
        "data/fma_manifest_3k_6genres.csv --max 10"
        if out["ready"] else
        "needs network egress + GENIUS_ACCESS_TOKEN (LRCLIB fallback needs "
        "egress only)")
    return out


def main() -> int:
    root = Path(sys.argv[1]) if len(sys.argv) > 1 else REPO
    checks = [check_audio_corpus(root), check_minilm(root),
              check_whisper(), check_lyrics_apis()]
    ready = [c for c in checks if c["ready"]]
    print(json.dumps({"root": str(root),
                      "ready": [c["name"] for c in ready],
                      "blocked": [c["name"] for c in checks
                                  if not c["ready"]],
                      "checks": checks}, indent=2))
    print(f"\n{len(ready)}/{len(checks)} real-data closures ready",
          file=sys.stderr)
    for c in checks:
        mark = "READY  " if c["ready"] else "blocked"
        print(f"  [{mark}] {c['name']}: {c['next_step']}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
