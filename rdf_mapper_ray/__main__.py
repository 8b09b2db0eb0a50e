from rdf_mapper_ray.cli import main

raise SystemExit(main())
