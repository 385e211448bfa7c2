"""Sources and sinks: the SAP RFC connector (distributed rebuild of the
reference's single-threaded pipeline) and lake file formats."""
