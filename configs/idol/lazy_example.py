# Example lazy (python-file) config for IDOL, loadable with
# tools/lazyconfig_train_net.py or vnext_tpu.config.LazyConfig.load.
from vnext_tpu.config import LazyCall
from vnext_tpu.models.idol import IDOL

model = LazyCall(IDOL)(
    num_classes=40,
    hidden_dim=256,
    num_queries=300,
    enc_layers=6,
    dec_layers=6,
)

train = {
    "output_dir": "./output/idol_lazy",
    "max_iter": 12000,
    "seed": 0,
}

optimizer = {
    "name": "adamw",
    "lr": 1e-4,
    "weight_decay": 1e-4,
    "backbone_multiplier": 0.1,
}
