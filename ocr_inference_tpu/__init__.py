"""ocr_inference_tpu — a TPU-native OCR inference framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
buda-base/ocr-inference (Tibetan pecha/manuscript OCR):

- ``core``      typed data model, enums, model-config readers (reference:
                BDRC/data.py, Config.py, BDRC/utils.py config readers)
- ``ops``       JAX/Pallas image kernels: binarize, tile/stitch, resize,
                rotate, dilate, remap (reference: BDRC/utils.py:438-1109)
- ``models``    Flax segmentation + recognition networks (reference executes
                opaque ONNX graphs via onnxruntime, BDRC/inference.py:121-429)
- ``onnx``      self-contained ONNX model parser + JAX executor + weight
                importer (replaces the onnxruntime dependency)
- ``decode``    on-device CTC greedy/beam decode + host LM rescoring
                (reference: pyctcdecode + KenLM, BDRC/inference.py:75-118)
- ``text``      EWTS (Wylie) <-> Tibetan Unicode conversion, stack tokenizer,
                label encoders (reference: pyewts/botok, BDRC/label_encoder.py)
- ``geometry``  contour/line geometry, reading order, deskew
                (reference: BDRC/line_detection.py)
- ``dewarp``    thin-plate-spline dewarping, fitted and sampled in JAX
                (reference: BDRC/image_dewarping.py)
- ``pipeline``  page OCR pipeline with batched device execution
                (reference: BDRC/inference.py:432-826, BDRC/pipeline.py)
- ``io``        exporters, parquet writers, artifact manager, audit logger
                (reference: BDRC/exporter.py, artifact_manager.py,
                audit_logger.py, parquet writers in utils.py)
- ``parallel``  device mesh + sharding runtime for multi-chip batches
- ``eval``      CER evaluation harness (reference: OCREvaluator)
- ``training``  CTC fine-tuning (new capability; the reference ships none)
- ``cli``       command line entry points (reference: cli.py,
                infer_lines_cli.py, download_model_cli.py)
"""

__version__ = "0.1.0"
