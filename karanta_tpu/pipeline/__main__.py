from karanta_tpu.pipeline.runner import main

main()
