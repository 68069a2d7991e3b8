"""One-time conversion of the reference prod_net checkpoint into the native
bundle format shipped in cut_detection_tpu/prod_net/.

Reads the torch state dicts from /root/reference/frameID/prod_net
(net.py:221-233's bundled checkpoint) and writes init_model.npz plus the
model-params JSON sidecar (same contract as supervised_training.py:228-245).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cut_detection_tpu.checkpoint.convert import convert_torch_checkpoint
from cut_detection_tpu.checkpoint.io import save_bundle

REF = "/root/reference/frameID/prod_net"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "cut_detection_tpu", "prod_net")

bundle, model_params = convert_torch_checkpoint(
    os.path.join(REF, "init_model_model_params.json"),
    os.path.join(REF, "init_model_classifier_conv.pt"),
    os.path.join(REF, "init_model_classifier_linear.pt"),
)
os.makedirs(OUT, exist_ok=True)
save_bundle(os.path.join(OUT, "init_model.npz"), bundle)
model_params.to_json(os.path.join(OUT, "init_model_model_params.json"))
print("wrote", os.path.join(OUT, "init_model.npz"))
print("model_params:", model_params)
