"""Few-shot linear-probe eval preset.

Parity target: /root/reference/big_vision/configs/common_fewshot.py:20-47 —
closed-form LSR probe on pre_logits, 100 shots, l2_reg 1024.
"""


def get_fewshot_lsr(target_resolution=64, resize_resolution=67,
                    runlocal=False, datasets=None, pred="predict"):
  return dict(
      type="fewshot_lsr",
      pred=pred,
      representation_layer="pre_logits",
      log_steps=25_000,
      datasets=datasets or {},
      shots=(100,),
      l2_reg=2.0 ** 10,
      num_seeds=3 if not runlocal else 1,
      display_first=[("imagenet", 100)],
      pp_train=(f"decode|resize_small({resize_resolution})"
                f"|central_crop({target_resolution})"
                f'|value_range(-1, 1)|keep("image", "label")'),
      pp_eval=(f"decode|resize_small({resize_resolution})"
               f"|central_crop({target_resolution})"
               f'|value_range(-1, 1)|keep("image", "label")'),
  )
