from vae_hmc_tpu.text.embed import embed_texts  # noqa: F401
from vae_hmc_tpu.text.langdetect import detect_language_simple  # noqa: F401
from vae_hmc_tpu.text.tfidf import TfidfVectorizer  # noqa: F401
