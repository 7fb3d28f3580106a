function CHECK_FILE_EXIST(filename)
% CHECK_FILE_EXIST(filename)  —  fail fast before handing a missing path
% to the gateway.

if exist(filename, 'file') == 0
  error('%s does not exist', filename);
end

end
