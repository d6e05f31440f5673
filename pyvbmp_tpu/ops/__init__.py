"""Hot compute paths: associative-scan smoothers and fused reductions."""
