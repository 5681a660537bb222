"""Production serving: dynamic request batching + a minimal HTTP server.

The reference serves one request at a time through its Gradio/Streamlit apps
(/root/reference/app.py:26-43, streamlit_app.py:22-45, batch_size=1 via
``generate_spectrogram_and_audio``). On a TPU that wastes the chip: measured
throughput rises ~12x from batch 1 to the batch-32 knee (BASELINE.md latent
ledger). This subsystem keeps the reference's one-request-per-user API surface
while the device runs full batches.
"""

from .batcher import DynamicBatcher, GenerationResult, QueueFull
from .server import AudioDiffusionServer, make_server

__all__ = ["DynamicBatcher", "GenerationResult", "QueueFull",
           "AudioDiffusionServer", "make_server"]
