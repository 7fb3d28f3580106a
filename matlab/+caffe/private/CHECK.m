function CHECK(expr, error_msg)
% CHECK(expr, error_msg)  —  assert with a caller-facing message.

if ~expr
  error(error_msg);
end

end
